package graft.core

import graft.SparkTestBase

class ImputeDiscretizeSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    ("g1", Some(10.0)), ("g1", Some(20.0)), ("g1", None),
    ("g2", Some(5.0)), ("g2", None),
    ("g3", Option.empty[Double]))
    .toDF("g", "v")

  test("imputeNulls mean fills per group; all-null groups stay null") {
    val out = Stats.imputeNulls(df, Seq("g"), "v")
      .collect().map(r => (r.getString(0), Option(r.getAs[java.lang.Double]("v_imputed"))))
    val byGroup = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byGroup("g1") == Set(Some(10.0), Some(20.0), Some(15.0)))
    assert(byGroup("g2") == Set(Some(5.0)))
    assert(byGroup("g3") == Set(None), "all-null group must NOT leak a global fill")
  }

  test("imputeNulls median and global mode") {
    val d = Seq(Some(1.0), Some(2.0), Some(9.0), None).toDF("v")
    val med = Stats.imputeNulls(d, Nil, "v", strategy = "median")
      .collect().map(_.getAs[Double]("v_imputed")).toSeq.sorted
    assert(med == Seq(1.0, 2.0, 2.0, 9.0))
    intercept[IllegalArgumentException](Stats.imputeNulls(d, Nil, "v", "mode"))
  }

  test("quantileDiscretize: equi-depth buckets, ties at bounds go low, nulls null") {
    val d = (1 to 100).map(_.toDouble).toDF("v")
    val out = Stats.quantileDiscretize(d, "v", numBuckets = 4)
      .collect().map(r => r.getDouble(0) -> r.getInt(1)).toMap
    // exact interpolated quartiles of 1..100: 25.75, 50.5, 75.25
    assert(out(25.0) == 0 && out(26.0) == 1)
    assert(out(50.0) == 1 && out(51.0) == 2)
    assert(out(75.0) == 2 && out(76.0) == 3)
    // bucket sizes are balanced
    val sizes = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes == Map(0 -> 25, 1 -> 25, 2 -> 25, 3 -> 25))
  }

  test("quantileDiscretize per group uses each group's own bounds") {
    val d = ((1 to 10).map(i => ("small", i.toDouble)) ++
      (1 to 10).map(i => ("big", i * 1000.0))).toDF("g", "v")
    val out = Stats.quantileDiscretize(d, "v", 2, groupCols = Seq("g"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getInt(2)).toMap
    assert(out(("small", 10.0)) == 1 && out(("big", 1000.0)) == 0,
      "groups must be bucketed against their own distribution")
  }

  test("quantileDiscretize approx path agrees on well-separated data") {
    val d = (1 to 1000).map(_.toDouble).toDF("v")
    val exact = Stats.quantileDiscretize(d, "v", 4)
      .collect().map(r => r.getDouble(0) -> r.getInt(1)).toMap
    val approx = Stats.quantileDiscretize(d, "v", 4, exact = false)
      .collect().map(r => r.getDouble(0) -> r.getInt(1)).toMap
    val agree = exact.count { case (k, b) => approx(k) == b }
    assert(agree >= 990, s"approx disagreed on ${1000 - agree} of 1000")
  }

  test("scale shape: grouped-agg + join, no whole-corpus window sort") {
    val d = (1 to 1000).map(i => (s"g${i % 3}", i.toDouble)).toDF("g", "v")
    val plan = Stats.quantileDiscretize(d, "v", 4, groupCols = Seq("g"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"ntile-style window leaked in:\n$plan")
    val plan2 = Stats.imputeNulls(d, Seq("g"), "v")
      .queryExecution.executedPlan.toString
    assert(!plan2.contains("Window"), s"window leaked in:\n$plan2")
  }
}
