package graft.core

import graft.SparkTestBase

class DriftSpec extends SparkTestBase {
  import spark.implicits._

  test("categoricalDrift: identical distributions have ~zero PSI/KL") {
    val ref = Seq("a", "a", "b", "b", "c").toDF("k")
    val cur = Seq("a", "a", "b", "b", "c").toDF("k")
    val out = Drift.categoricalDrift(ref, cur, "k").collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("psi_term")) < 1e-9)
      assert(math.abs(r.getAs[Double]("kl_term")) < 1e-9)
      assert(r.getAs[Double]("p_ref") == r.getAs[Double]("p_cur"))
    }
  }

  test("categoricalDrift matches a hand-computed shifted case") {
    // ref: a×8 b×2; cur: a×2 b×8 — strong shift
    val ref = (Seq.fill(8)("a") ++ Seq.fill(2)("b")).toDF("k")
    val cur = (Seq.fill(2)("a") ++ Seq.fill(8)("b")).toDF("k")
    val eps = 1e-6
    val out = Drift.categoricalDrift(ref, cur, "k", eps).collect()
      .map(r => r.getAs[String]("category") -> r).toMap
    def p(nn: Long) = (nn + eps) / (10 + 2 * eps)
    val expA = BigDecimal((p(2) - p(8)) * math.log(p(2) / p(8)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("a").getAs[Double]("psi_term") == expA)
    assert(out("a").getAs[Long]("n_ref") == 8L)
    assert(out("a").getAs[Long]("n_cur") == 2L)
    // symmetric shift: both categories contribute equal PSI
    assert(out("a").getAs[Double]("psi_term") ==
      out("b").getAs[Double]("psi_term"))
  }

  test("one-sided categories stay finite via smoothing") {
    val ref = Seq("a", "a", "b").toDF("k")
    val cur = Seq("a", "c", "c").toDF("k")
    val rows = Drift.categoricalDrift(ref, cur, "k").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(!r.getAs[Double]("psi_term").isNaN)
      assert(!r.getAs[Double]("psi_term").isInfinite)
    }
    val b = rows.find(_.getAs[String]("category") == "b").get
    assert(b.getAs[Long]("n_cur") == 0L)
  }

  test("nulls become the (null) category") {
    val ref = Seq(Some("a"), None, None).toDF("k")
    val cur = Seq(Some("a"), None).toDF("k")
    val cats = Drift.categoricalDrift(ref, cur, "k").collect()
      .map(_.getAs[String]("category")).toSet
    assert(cats == Set("a", "(null)"))
  }

  test("numericDrift: clamping keeps totals, bucket ids are stable") {
    val ref = Seq(-5.0, 0.5, 1.5, 2.5, 99.0).toDF("v") // clamps: -5→0, 99→3
    val cur = Seq(0.1, 0.2, 3.9).toDF("v")
    val out = Drift.numericDrift(ref, cur, "v", lo = 0.0, hi = 4.0, bins = 4)
      .collect().map(r => r.getAs[String]("category") -> r).toMap
    assert(out("0").getAs[Long]("n_ref") == 2L) // -5 clamped + 0.5
    assert(out("3").getAs[Long]("n_ref") == 1L) // 99 clamped
    assert(out("0").getAs[Long]("n_cur") == 2L)
    assert(out.values.map(_.getAs[Long]("n_ref")).sum == 5L)
    assert(out.values.map(_.getAs[Long]("n_cur")).sum == 3L)
  }

  test("driftSummary: shifted distribution reads as drifted, identical as stable") {
    val ref = (Seq.fill(80)("a") ++ Seq.fill(20)("b")).toDF("k")
    val cur = (Seq.fill(20)("a") ++ Seq.fill(80)("b")).toDF("k")
    val row = Drift.driftSummary(ref, cur, "k").collect()(0)
    assert(row.getAs[Double]("psi") > 0.25, "strong shift must exceed the 0.25 bar")
    assert(row.getAs[Double]("kl_divergence") > 0.0)
    assert(row.getAs[Double]("chi2") > 0.0)
    assert(row.getAs[Long]("n_categories") == 2L)
    val same = Drift.driftSummary(ref, ref, "k").collect()(0)
    assert(math.abs(same.getAs[Double]("psi")) < 1e-9)
  }

  test("inputs reduce before the join: no corpus-sized exchange") {
    val ref = (1 to 1000).map(i => s"c${i % 7}").toDF("k")
    val cur = (1 to 1000).map(i => s"c${i % 5}").toDF("k")
    val plan = Drift.categoricalDrift(ref, cur, "k")
      .queryExecution.executedPlan.toString
    // the only hash exchanges allowed are the two category aggregations
    // + the full-outer join of category-sized frames
    assert(!plan.contains("SortMergeJoin") ||
      plan.contains("Exchange hashpartitioning(category"),
      s"unexpected plan:\n$plan")
  }

  test("bad args throw") {
    val d = Seq("a").toDF("k")
    intercept[graft.ColumnNotInDataframeError](
      Drift.categoricalDrift(d, d, "zzz"))
    intercept[IllegalArgumentException](
      Drift.numericDrift(d.withColumnRenamed("k", "v"),
        d.withColumnRenamed("k", "v"), "v", 1.0, 0.0, 4))
  }

  test("ksStatistic: hand-computed sup, identity → 0, disjoint → 1") {
    import org.apache.spark.sql.functions.col
    // ref {1,2,3,4}, cur {3,4,5,6}: sup at v=2 → |2/4 - 0/4| = 0.5
    val ref = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val cur = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    val row = Drift.ksStatistic(ref, cur, "v").head()
    assert(row.getAs[Long]("n_ref") == 4L && row.getAs[Long]("n_cur") == 4L)
    assert(row.getAs[Double]("ks_stat") == 0.5)
    assert(Drift.ksStatistic(ref, ref, "v").head().getAs[Double]("ks_stat") == 0.0)
    val hi = Seq(100.0, 101.0).toDF("v")
    assert(Drift.ksStatistic(ref, hi, "v").head().getAs[Double]("ks_stat") == 1.0)
    // nulls excluded
    val withNull = Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0), None).toDF("v")
    assert(Drift.ksStatistic(withNull, cur, "v").head().getAs[Long]("n_ref") == 4L)
  }

  test("ksStatistic matches the single-partition naive cumsum on random data") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(5)
    val ref = Seq.fill(400)(rng.nextGaussian()).toDF("v").repartition(7)
    val cur = Seq.fill(300)(rng.nextGaussian() + 0.3).toDF("v").repartition(3)
    val fast = Drift.ksStatistic(ref, cur, "v").head().getAs[Double]("ks_stat")
    // force the distributed partition-offset path: identical result
    val forced = Drift.ksStatistic(ref, cur, "v", distinctThreshold = 0L)
      .head().getAs[Double]("ks_stat")
    assert(forced == fast, s"offset path diverged: $forced vs $fast")
    val u = ref.select(col("v"), lit(1L).as("nr"), lit(0L).as("nc"))
      .unionByName(cur.select(col("v"), lit(0L).as("nr"), lit(1L).as("nc")))
      .groupBy("v").agg(sum("nr").as("nr"), sum("nc").as("nc"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = u
      .withColumn("cr", sum("nr").over(w)).withColumn("cc", sum("nc").over(w))
      .agg(round(max(abs(col("cr") / 400.0 - col("cc") / 300.0)), 9))
      .head().getDouble(0)
    assert(fast == naive, s"fast=$fast naive=$naive")
    assert(fast > 0.1 && fast < 0.4, s"shifted gaussians: $fast")
  }

  test("sumSquares kernel ≡ the aggregate HOF fold (incl. null elements)") {
    import org.apache.spark.sql.functions._
    val d = Seq(
      Seq[java.lang.Double](1.0, 2.0, 3.0),
      Seq[java.lang.Double](0.1, -0.2, 0.3),
      Seq[java.lang.Double](4.0, null, 5.0),
      Seq[java.lang.Double](),
      Seq[java.lang.Double](1e200, 1e200),
      // r20 adversarial pins: NaN poisons the fold arithmetically (not
      // via null), -0.0² folds to +0.0, null AFTER NaN still nulls
      Seq[java.lang.Double](Double.NaN, 1.0),
      Seq[java.lang.Double](-0.0, -0.0),
      Seq[java.lang.Double](Double.NaN, null),
      Seq[java.lang.Double](Double.PositiveInfinity, 1.0)).toDF("v")
    // bit-pattern comparison: NaN == NaN and +0.0 != -0.0 (Scala ==
    // unboxes java.lang.Double, so Some(NaN) != Some(NaN) otherwise)
    val hof = d.select(aggregate(col("v"), lit(0.0), (a, x) => a + x * x).as("s"))
      .collect().map(r =>
        if (r.isNullAt(0)) None
        else Some(java.lang.Double.doubleToLongBits(r.getDouble(0)))).toSeq
    val kernel = d.select(org.apache.spark.sql.graft.ColumnBridge(
        graft.functions.SumSquaresExpr(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("v")))).as("s"))
      .collect().map(r =>
        if (r.isNullAt(0)) None
        else Some(java.lang.Double.doubleToLongBits(r.getDouble(0)))).toSeq
    assert(kernel == hof)
  }

  test("embeddingDrift: hand-computed centroid cosine and norms, identity, empty side") {
    val ref = Seq(Array(1.0, 0.0), Array(0.0, 1.0)).toDF("v")
    val cur = Seq(Array(1.0, 0.0), Array(1.0, 0.0)).toDF("v")
    val r = Drift.embeddingDrift(ref, cur, "v").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    // centroids (0.5, 0.5) vs (1, 0): cos = 0.5 / (sqrt(0.5) * 1)
    assert(math.abs(r.getDouble(2) - BigDecimal(0.5 / math.sqrt(0.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0)
    // identical sets: cosine exactly 1, norms equal
    val same = Drift.embeddingDrift(ref, ref, "v").head()
    assert(same.getDouble(2) == 1.0)
    // empty side: null metrics, counts intact
    val empty = Seq.empty[Array[Double]].toDF("v")
    val e = Drift.embeddingDrift(ref, empty, "v").head()
    assert(e.getLong(0) == 2L && e.getLong(1) == 0L && e.isNullAt(2) && e.isNullAt(4))
  }
}
