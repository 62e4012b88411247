package graft.checks

import graft.{ColumnNotInDataframeError, SparkTestBase}

class ChecksSpec extends SparkTestBase {
  import spark.implicits._

  test("countNulls counts per column, full and subset") {
    val d = df("a INT, b STRING", Seq(1, null), Seq(null, "x"), Seq(2, "y"))
    assert(Checks.countNulls(d) == Map("a" -> 1L, "b" -> 1L))
    assert(Checks.countNulls(d, Seq("a")) == Map("a" -> 1L))
    assertThrows[ColumnNotInDataframeError](Checks.countNulls(d, Seq("zz")))
  }

  test("aggregateCol computes sum/max/min/mean; rejects other ops") {
    val d = Seq(1.0, 2.0, 3.0).toDF("x")
    assert(Checks.aggregateCol(d, "x", "sum") == 6.0)
    assert(Checks.aggregateCol(d, "x", "max") == 3.0)
    assert(Checks.aggregateCol(d, "x", "min") == 1.0)
    assert(Checks.aggregateCol(d, "x", "mean") == 2.0)
    assertThrows[IllegalArgumentException](Checks.aggregateCol(d, "x", "median"))
  }

  test("getUnique sorts numerics natively, not lexicographically") {
    // regression: [2, 10, 1] must give [1, 2, 10], not [1, 10, 2] (VERDICT #2)
    val d = Seq(2, 10, 1, 10).toDF("x")
    assert(Checks.getUnique(d, "x") == List(1, 2, 10))
  }

  test("getUnique puts nulls last; removeNull drops them") {
    val d = df("x STRING", Seq("b"), Seq(null), Seq("a"))
    assert(Checks.getUnique(d, "x") == List("a", "b", null))
    assert(Checks.getUnique(d, "x", removeNull = true) == List("a", "b"))
  }

  test("getUnique sorts doubles and timestamps natively") {
    val dd = Seq(10.5, 2.5).toDF("x")
    assert(Checks.getUnique(dd, "x") == List(2.5, 10.5))
  }

  test("hasNoNulls") {
    assert(Checks.hasNoNulls(Seq(1, 2).toDF("x"), "x"))
    assert(!Checks.hasNoNulls(df("x STRING", Seq("a"), Seq(null)), "x"))
  }

  test("checkYearRange passes when all years present, lists missing otherwise") {
    val d = Seq(2020, 2021, 2023).toDF("year")
    Checks.checkYearRange(d, 2020, 2021, "year") // no throw
    assertThrowsMessage[AssertionError]("2022")(
      Checks.checkYearRange(d, 2020, 2023, "year"))
  }

  test("assertSameDistinctValues reports asymmetric differences") {
    val d1 = Seq("a", "b").toDF("x")
    val d2 = Seq("b", "c").toDF("x")
    Checks.assertSameDistinctValues(d1, d1, "x") // no throw
    val e = intercept[AssertionError](Checks.assertSameDistinctValues(d1, d2, "x"))
    assert(e.getMessage.contains("a") && e.getMessage.contains("c"))
  }
}
