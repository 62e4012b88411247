package graft.methods

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Golden values mirror reference tests/methods/test_averaging_methods.py:10-120. */
class AveragingSpec extends SparkTestBase {

  // quantity as DOUBLE: a mixed Seq(0.7, 1, …) unifies to Double in Scala,
  // which would not match an INT schema field
  private def input = df("price DOUBLE, quantity DOUBLE, weight DOUBLE",
    Seq(0.7, 1.0, 0.090909091),
    Seq(1.0, 5.0, 0.454545455),
    Seq(1.5, 3.0, 0.272727273),
    Seq(1.4, 2.0, 0.181818182))

  private def agg1(c: org.apache.spark.sql.Column): Double =
    input.agg(c.as("avg")).head().getDouble(0)

  test("weightedArithmeticAverage matches reference golden value") {
    assert(math.abs(agg1(Averaging.weightedArithmeticAverage(col("price"), col("weight"))) - 1.1818182) < 1e-7)
  }

  test("weightedGeometricAverage matches reference golden value") {
    assert(math.abs(agg1(Averaging.weightedGeometricAverage(col("price"), col("weight"))) - 1.1495070) < 1e-7)
  }

  test("unweightedArithmeticAverage is the plain mean") {
    assert(math.abs(agg1(Averaging.unweightedArithmeticAverage(col("price"))) - 1.15) < 1e-9)
  }

  test("unweightedGeometricAverage is exp(mean(ln))") {
    val expected = math.exp(Seq(0.7, 1.0, 1.5, 1.4).map(math.log).sum / 4)
    assert(math.abs(agg1(Averaging.unweightedGeometricAverage(col("price"))) - expected) < 1e-9)
  }

  test("getWeightShares normalises weights to shares per group") {
    val d = df("g STRING, w DOUBLE", Seq("a", 1.0), Seq("a", 3.0), Seq("b", 5.0))
    val out = d.withColumn("share", Averaging.getWeightShares(col("w"), Seq("g")))
    val got = out.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(got == Set(("a", 1.0, 0.25), ("a", 3.0, 0.75), ("b", 5.0, 1.0)))
  }

  test("weight shares then weighted average reproduces reference pipeline") {
    // shares derived from quantity reproduce the fixture's weight column
    val withShares = input.withColumn("w2",
      Averaging.getWeightShares(col("quantity"), Seq.empty))
    val avg = withShares.agg(
      Averaging.weightedArithmeticAverage(col("price"), col("w2")).as("a"))
      .head().getDouble(0)
    assert(math.abs(avg - 1.1818182) < 1e-6)
  }
}
