package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class EncodeSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), Some(10.0)), (2L, Some("a"), Some(20.0)),
    (3L, Some("b"), Some(30.0)), (4L, None, Some(40.0)),
    (5L, Some("c"), None))
    .toDF("id", "cat", "t")

  test("frequencyEncode counts per level including the null level") {
    val out = Encode.frequencyEncode(df, Seq("cat"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("frequencyEncode normalize yields fractions") {
    val out = Encode.frequencyEncode(df, Seq("cat"), normalize = true)
      .filter(col("id") === 1).head().getDouble(3)
    assert(math.abs(out - 0.4) < 1e-9)
  }

  test("targetEncode: smoothing 0 is the plain category mean; m pulls to global") {
    val plain = Encode.targetEncode(df, "cat", "t", smoothing = 0.0)
      .filter(col("id") === 1).head().getDouble(3)
    assert(plain == 15.0)
    // global mean of non-null targets = 25; m=2: (30 + 2*25)/(1+2)
    val smoothed = Encode.targetEncode(df, "cat", "t", smoothing = 2.0)
      .filter(col("id") === 3).head().getDouble(3)
    assert(math.abs(smoothed - 80.0 / 3.0) < 1e-6)
  }

  test("targetEncode: all-null-target category gets exactly the global mean") {
    val out = Encode.targetEncode(df, "cat", "t", smoothing = 5.0)
      .filter(col("id") === 5).head().getDouble(3)
    assert(out == 25.0)
  }

  test("scale shape: encoders are grouped aggs + joins, never windows") {
    for (p <- Seq(
      Encode.frequencyEncode(df, Seq("cat")),
      Encode.targetEncode(df, "cat", "t"))) {
      val plan = p.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"window leaked in:\n$plan")
    }
  }

  test("pivotWide is melt's inverse on explicit values; unlisted values drop") {
    val long = Seq(("r1", "F", 1.0), ("r1", "F", 2.0), ("r1", "O", 5.0),
      ("r2", "O", 7.0), ("r2", "X", 99.0))
      .toDF("k", "p", "v")
    val wide = DataFrameOps.pivotWide(long, Seq("k"), "p", "v", Seq("F", "O"))
      .collect().map(r => r.getString(0) ->
        (Option(r.getAs[java.lang.Double]("F")), Option(r.getAs[java.lang.Double]("O")))).toMap
    assert(wide("r1") == (Some(3.0), Some(5.0)))
    assert(wide("r2") == (None, Some(7.0)), "unlisted 'X' must not leak anywhere")
    intercept[IllegalArgumentException](
      DataFrameOps.pivotWide(long, Seq("k"), "p", "v", Seq("F"), agg = "median"))
  }

  test("pivotWide plans as ONE agg pair — no second exchange, no distinct job") {
    val long = Seq(("r1", "F", 1.0)).toDF("k", "p", "v")
    val plan = DataFrameOps.pivotWide(long, Seq("k"), "p", "v", Seq("F", "O"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected the single partial/final exchange, got $exchanges in:\n$plan")
    assert(!plan.toLowerCase.contains("expand"), s"unexpected expand in:\n$plan")
  }
}
