package graft.core

import graft.SparkTestBase

class StatsSpec extends SparkTestBase {
  import spark.implicits._

  test("winsorize clips to per-group percentile bounds") {
    // group a: 1..9 plus outlier 1000; p10/p90 of (1..9,1000)
    val df = ((1 to 9).map(i => ("a", i.toDouble)) :+ (("a", 1000.0)))
      .toDF("g", "v")
    val out = Stats.winsorize(df, Seq("g"), "v", lowP = 0.1, highP = 0.9)
    val wins = out.select("v_wins").as[Double].collect()
    // exact interpolating p90 of the 10 values = 9 + 0.1*(1000-9) = 108.1
    assert(wins.max == 108.1)
    assert(wins.min == 1.9) // p10 = 1 + 0.9*(2-1)
    assert(out.count() == 10)
  }

  test("zscoreOutliers flags only extreme values and survives zero variance") {
    val df = ((1 to 20).map(i => ("a", 10.0)) :+ (("a", 10000.0))).toDF("g", "v") // near-constant + spike
      .union(Seq(("b", 5.0), ("b", 5.0)).toDF("g", "v")) // zero variance
    val out = Stats.zscoreOutliers(df, Seq("g"), "v", threshold = 3.0)
    val flagged = out.filter("is_outlier").select("v").as[Double].collect()
    assert(flagged.toSeq == Seq(10000.0))
    assert(out.filter("g = 'b'").select("z").as[Double].collect().forall(_ == 0.0))
  }
}
