package graft.operators

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def points = Seq((1L, 5.0), (2L, 15.0), (3L, 25.0), (4L, 99.0))
    .toDF("pid", "v")
  private def ranges = Seq(("a", 0.0, 10.0), ("b", 10.0, 20.0), ("c", 4.0, 16.0))
    .toDF("name", "lo", "hi")

  test("rangeJoin matches points inside intervals, inclusive bounds") {
    val out = RangeJoin.rangeJoin(points, "v", ranges, "lo", "hi", binWidth = 10.0)
    val got = out.select("pid", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (1L, "c"), (2L, "b"), (2L, "c")))
  }

  test("rangeJoin boundary points match both adjacent intervals") {
    val boundary = Seq((9L, 10.0)).toDF("pid", "v")
    val got = RangeJoin.rangeJoin(boundary, "v", ranges, "lo", "hi", 10.0)
      .select("name").as[String].collect().toSet
    assert(got == Set("a", "b", "c"))
  }

  test("rangeJoin left keeps unmatched points with null ranges") {
    val out = RangeJoin.rangeJoin(points, "v", ranges, "lo", "hi", 10.0, how = "left")
    assert(out.filter($"pid" === 4).count() == 1)
    assert(out.filter($"pid" === 4).head().isNullAt(2))
    assert(out.filter($"pid" === 3).head().isNullAt(2)) // 25.0 matches nothing
    assert(out.count() == 6) // 4 matches + 2 unmatched
  }

  test("rangeJoin left preserves multiplicity of identical left rows") {
    // two identical matched points + two identical unmatched points:
    // a value-based reconstruction would conflate them
    val dupPoints = Seq((1L, 5.0), (1L, 5.0), (7L, 99.0), (7L, 99.0))
      .toDF("pid", "v")
    val out = RangeJoin.rangeJoin(dupPoints, "v", ranges, "lo", "hi", 10.0, how = "left")
    assert(out.filter($"pid" === 1 && $"name".isNotNull).count() == 4) // 2 rows × 2 ranges
    assert(out.filter($"pid" === 7 && $"name".isNull).count() == 2)
  }

  test("rangeJoin equi-joins on bins — no product join in the plan") {
    val plan = RangeJoin.rangeJoin(points, "v", ranges, "lo", "hi", 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"range join planned as a product:\n$plan")
  }

  test("validates bin width, join type, and column collisions") {
    assertThrows[IllegalArgumentException](
      RangeJoin.rangeJoin(points, "v", ranges, "lo", "hi", 0.0))
    assertThrows[IllegalArgumentException](
      RangeJoin.rangeJoin(points, "v", ranges, "lo", "hi", 10.0, how = "outer"))
    assertThrows[IllegalArgumentException](
      RangeJoin.rangeJoin(points, "v", ranges.withColumnRenamed("name", "pid"),
        "lo", "hi", 10.0))
  }

  test("rejects reserved working column names instead of clobbering them") {
    assertThrows[IllegalArgumentException](
      RangeJoin.rangeJoin(points.withColumnRenamed("pid", "__row_id"),
        "v", ranges, "lo", "hi", 10.0))
    assertThrows[IllegalArgumentException](
      RangeJoin.rangeJoin(points, "v",
        ranges.withColumnRenamed("name", "__bin"), "lo", "hi", 10.0))
  }
}
