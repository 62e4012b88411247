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

  test("intervalJoin: overlap pairs exactly once despite multi-bin spans") {
    import spark.implicits._
    val left = Seq((1L, 0.0, 10.0), (2L, 20.0, 30.0)).toDF("lid", "ls", "le")
    val right = Seq((10L, 5.0, 12.0), (20L, 40.0, 50.0), (30L, 9.0, 21.0))
      .toDF("rid", "rs", "re")
    val got = RangeJoin.intervalJoin(left, "ls", "le", right, "rs", "re", 10.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    // no duplicates even though [0,10]x[5,12] share two bins
    assert(got.sorted == Seq((1L, 10L), (1L, 30L), (2L, 30L)))
  }

  test("intervalJoin: touching endpoints are inclusive; disjoint drop") {
    import spark.implicits._
    val left = Seq((1L, 0.0, 5.0)).toDF("lid", "ls", "le")
    val right = Seq((10L, 5.0, 8.0), (20L, 5.1, 8.0)).toDF("rid", "rs", "re")
    val got = RangeJoin.intervalJoin(left, "ls", "le", right, "rs", "re", 2.0)
      .select("rid").as[Long].collect().toSeq
    assert(got == Seq(10L))
  }

  test("intervalJoin matches the naive quadratic truth on a random fixture") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val l = (1 to 60).map { i =>
      val s = rnd.nextDouble() * 100; (i.toLong, s, s + rnd.nextDouble() * 15)
    }.toDF("lid", "ls", "le")
    val r = (1 to 60).map { i =>
      val s = rnd.nextDouble() * 100; (i.toLong, s, s + rnd.nextDouble() * 15)
    }.toDF("rid", "rs", "re")
    val fast = RangeJoin.intervalJoin(l, "ls", "le", r, "rs", "re", 10.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val truth = l.crossJoin(r)
      .filter($"ls" <= $"re" && $"rs" <= $"le")
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(fast == truth && truth.nonEmpty)
  }

  test("intervalJoin validates binWidth and column collisions") {
    import spark.implicits._
    val l = Seq((1L, 0.0, 1.0)).toDF("lid", "ls", "le")
    val r = Seq((1L, 0.0, 1.0)).toDF("rid", "rs", "re")
    assertThrows[IllegalArgumentException](
      RangeJoin.intervalJoin(l, "ls", "le", r, "rs", "re", 0.0))
    assertThrows[IllegalArgumentException](
      RangeJoin.intervalJoin(l, "ls", "le",
        r.withColumnRenamed("rid", "lid"), "rs", "re", 1.0))
  }

  test("intervalJoin bin boundaries: point-touch, negatives, fractions — exactly once") {
    val l = Seq((1L, 0.0, 10.0), (2L, -3.5, -1.0), (3L, 4.0, 4.0))
      .toDF("lid", "llo", "lhi")
    val r = Seq((10L, 10.0, 20.0), (20L, -1.0, 0.5), (30L, 3.9, 6.1), (40L, 100.0, 110.0))
      .toDF("rid", "rlo", "rhi")
    // w=2: bins straddle every boundary class incl. negative floors
    val got = RangeJoin.intervalJoin(l, "llo", "lhi", r, "rlo", "rhi", 2.0)
      .groupBy("lid", "rid").count().collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2))).toMap
    // truth: inclusive-end overlap
    assert(got.keySet == Set((1L, 10L), (1L, 20L), (1L, 30L), (2L, 20L), (3L, 30L)))
    assert(got.values.forall(_ == 1L), s"pair emitted more than once: $got")
  }

  test("intervalJoin: inverted intervals raise in-plan; null bounds match nothing") {
    val l = Seq((1L, 10.0, 0.0)).toDF("lid", "llo", "lhi") // inverted
    val r = Seq((10L, 0.0, 20.0)).toDF("rid", "rlo", "rhi")
    val ex = intercept[Exception](
      RangeJoin.intervalJoin(l, "llo", "lhi", r, "rlo", "rhi", 2.0).collect())
    assert(ex.getMessage.contains("inverted interval") ||
      Option(ex.getCause).exists(_.getMessage.contains("inverted interval")))
    val lNull = Seq((1L, Option.empty[Double], Option(5.0))).toDF("lid", "llo", "lhi")
    assert(RangeJoin.intervalJoin(lNull, "llo", "lhi", r, "rlo", "rhi", 2.0).count() == 0)
  }
}
