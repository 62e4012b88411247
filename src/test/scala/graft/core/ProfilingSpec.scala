package graft.core

import graft.SparkTestBase

class ProfilingSpec extends SparkTestBase {
  import spark.implicits._

  test("crosstab counts cells and zero-fills empties") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "y")).toDF("r", "c")
    val out = Profiling.crosstab(df, "r", "c", Seq("x", "y", "z"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("a") == ((2L, 1L, 0L)))
    assert(out("b") == ((0L, 1L, 0L)))
  }

  test("histogram bins equal widths, clamps the max into the last bin") {
    val df = (0 to 10).map(_.toDouble).toDF("v") // 0..10, 5 bins of width 2
    val out = Profiling.histogram(df, "v", nBins = 5)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out(0L) == ((0.0, 2.0, 2L)))   // 0, 1
    assert(out(4L) == ((8.0, 10.0, 3L)))  // 8, 9, and 10 clamped
    assert(out.values.map(_._3).sum == 11L)
  }

  test("histogram with explicit bounds drops out-of-range rows") {
    val df = Seq(-5.0, 1.0, 2.0, 99.0).toDF("v")
    val out = Profiling.histogram(df, "v", nBins = 2, bounds = Some((0.0, 4.0)))
    assert(out.agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0) == 2L)
  }

  test("profileNumeric summarises each column in long format") {
    val df = Seq((1.0, Some(10.0)), (2.0, None), (3.0, Some(10.0))).toDF("a", "b")
    val out = Profiling.profileNumeric(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out("a") == ((3L, 0L, 3L, 1.0, 3.0)))
    assert(out("b") == ((2L, 1L, 1L, 10.0, 10.0)))
  }

  test("corrMatrix: all pairs in one pass, exact on constructed correlations") {
    val df = (1 to 50).map(i =>
      (i.toDouble, 2.0 * i + 1, -3.0 * i, (i % 2).toDouble))
      .toDF("x", "y_pos", "y_neg", "noise")
    val out = Profiling.corrMatrix(df, Seq("x", "y_pos", "y_neg", "noise"))
    val m = out.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m.size == 6, "n*(n-1)/2 pairs")
    assert(m(("x", "y_pos")) == 1.0)
    assert(m(("x", "y_neg")) == -1.0)
    assert(m(("y_pos", "y_neg")) == -1.0)
    // single aggregation pass: exactly one partial/final exchange
    val plan = Profiling.corrMatrix(df, Seq("x", "y_pos", "y_neg"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, s"one-pass violated:\n$plan")
    intercept[IllegalArgumentException](Profiling.corrMatrix(df, Seq("x")))
  }

  test("histogram on empty / all-null input raises a clear error, not NPE") {
    val empty = Seq.empty[(Long, java.lang.Double)].toDF("id", "v")
    val e = intercept[IllegalArgumentException](Profiling.histogram(empty, "v", 4))
    assert(e.getMessage.contains("no non-null values"))
    val allNull = Seq((1L, null: java.lang.Double)).toDF("id", "v")
    intercept[IllegalArgumentException](Profiling.histogram(allNull, "v", 4))
    // explicit bounds still work on thin data
    assert(Profiling.histogram(allNull, "v", 4, bounds = Some((0.0, 1.0))).count() == 0)
  }
}
