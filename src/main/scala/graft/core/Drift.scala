package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ColumnNotInDataframeError

/** Distribution-drift metrics between two corpus snapshots — the
  * standard gate before a refreshed training corpus replaces the last
  * one: PSI (population stability index), KL divergence, and a
  * chi-square statistic, per category and summarised.
  *
  * Scale shape: each input is reduced by ONE grouped aggregation to
  * category cardinality (partial + final hash agg — the 100 TB corpus
  * crosses the wire as one row per category per partition); the
  * full-outer category join and the total-count cross joins operate on
  * those tiny aggregates (AQE broadcasts them), and every metric term
  * is a narrow projection. Nothing downstream of the two scans is
  * corpus-sized. The numeric variant buckets values with explicit
  * caller-fixed breaks FIRST (a narrow projection), so it rides the
  * same category path — and fixed breaks are the deliberate contract:
  * quantile-derived breaks would make the metric depend on the
  * snapshot that computed them, which is exactly the
  * non-reproducibility drift gates exist to prevent.
  *
  * Zero-count smoothing: both proportions are computed as
  * (n + eps) / (N + K·eps) over the UNION of categories (K = union
  * cardinality), so log terms stay finite when a category exists in
  * only one snapshot — the additive-smoothing analogue both engines
  * can reproduce bit-for-bit.
  */
object Drift {

  private def requireCol(df: DataFrame, c: String, what: String): Unit =
    if (!df.columns.contains(c))
      throw new ColumnNotInDataframeError(s"$what: column `$c` not in dataframe")

  /** Per-category drift between `ref` and `cur` on `keyCol` (nulls
    * surface as the "(null)" category). One row per category in either
    * snapshot: counts, smoothed proportions, and the PSI / KL(cur‖ref)
    * contribution of that category (all rounded 6 dp). */
  def categoricalDrift(
      ref: DataFrame,
      cur: DataFrame,
      keyCol: String,
      eps: Double = 1e-6): DataFrame = {
    requireCol(ref, keyCol, "categoricalDrift(ref)")
    requireCol(cur, keyCol, "categoricalDrift(cur)")
    require(eps > 0, s"categoricalDrift: eps must be positive, got $eps")
    val key = coalesce(col(keyCol).cast("string"), lit("(null)")).as("category")
    val refCounts = ref.select(key).groupBy("category")
      .agg(count(lit(1)).as("n_ref"))
    val curCounts = cur.select(key).groupBy("category")
      .agg(count(lit(1)).as("n_cur"))
    histogramDrift(refCounts, curCounts, eps)
  }

  /** Numeric drift on `valueCol` via `bins` equi-width buckets over the
    * caller-fixed [lo, hi) range; out-of-range values clamp into the
    * edge buckets (totals stay equal to the non-null counts), nulls are
    * dropped. Category labels are the bucket indices "0".."bins-1". */
  def numericDrift(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      lo: Double,
      hi: Double,
      bins: Int,
      eps: Double = 1e-6): DataFrame = {
    requireCol(ref, valueCol, "numericDrift(ref)")
    requireCol(cur, valueCol, "numericDrift(cur)")
    require(bins > 0, s"numericDrift: bins must be positive, got $bins")
    require(lo < hi, s"numericDrift: need lo < hi, got ($lo, $hi)")
    val width = (hi - lo) / bins
    def bucketed(df: DataFrame, as: String) = df
      .filter(col(valueCol).isNotNull)
      .select(least(greatest(
          floor((col(valueCol).cast("double") - lo) / width), lit(0L)),
        lit(bins - 1L)).cast("string").as("category"))
      .groupBy("category").agg(count(lit(1)).as(as))
    histogramDrift(bucketed(ref, "n_ref"), bucketed(cur, "n_cur"), eps)
  }

  /** Core: join two (category, count) frames on the category union and
    * emit per-category smoothed proportions + PSI / KL terms. */
  private def histogramDrift(
      refCounts: DataFrame,
      curCounts: DataFrame,
      eps: Double): DataFrame = {
    val joined = refCounts.join(curCounts, Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(
      sum("n_ref").as("__t_ref"), sum("n_cur").as("__t_cur"),
      count(lit(1)).as("__k"))
    joined.crossJoin(broadcast(totals))
      .withColumn("p_ref",
        (col("n_ref") + eps) / (col("__t_ref") + col("__k") * eps))
      .withColumn("p_cur",
        (col("n_cur") + eps) / (col("__t_cur") + col("__k") * eps))
      .select(col("category"), col("n_ref"), col("n_cur"),
        round(col("p_ref"), 6).as("p_ref"),
        round(col("p_cur"), 6).as("p_cur"),
        round((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")), 6)
          .as("psi_term"),
        round(col("p_cur") * log(col("p_cur") / col("p_ref")), 6).as("kl_term"))
  }

  /** Smoothed reference proportions for a categorical column — the
    * broadcast-sized frame the windowed/streaming drift path probes:
    * `(category, p_ref)` with the same (n+eps)/(N+K·eps) smoothing as
    * [[categoricalDrift]]. */
  def referenceProportions(
      ref: DataFrame,
      keyCol: String,
      eps: Double = 1e-6): DataFrame = {
    requireCol(ref, keyCol, "referenceProportions")
    val key = coalesce(col(keyCol).cast("string"), lit("(null)")).as("category")
    val counts = ref.select(key).groupBy("category")
      .agg(count(lit(1)).as("n_ref"))
    val totals = counts.agg(sum("n_ref").as("__t"), count(lit(1)).as("__k"))
    counts.crossJoin(broadcast(totals))
      .select(col("category"),
        ((col("n_ref") + eps) / (col("__t") + col("__k") * eps)).as("p_ref"))
  }

  /** PSI per time window from per-(window, category) counts — the
    * batch finisher of the two-stage streaming drift monitor (stage 1,
    * [[graft.streaming.Streaming.windowedCategoryCounts]], is the
    * single stateful streaming aggregation; THIS stage runs per
    * micro-batch in `foreachBatch` or downstream of the sink, the
    * standard split because chained stateful aggregations are what
    * streaming engines restrict).
    *
    * The category universe is the REFERENCE's (the fixed taxonomy a
    * monitor alarms against): each window is scored over a
    * window × ref-category grid (ref is broadcast-sized), with
    * observed categories outside the reference ignored. Output one row
    * per window: `(window_start, psi, n_events)`.
    *
    * Scale shape: `counts` is already window × category sized (the
    * corpus reduction happened in stage 1's streaming agg); everything
    * here joins frames of that size or smaller — window-count-sized
    * exchanges, broadcast ref. */
  def driftPerWindow(
      counts: DataFrame,
      refProportions: DataFrame,
      eps: Double = 1e-6): DataFrame = {
    Seq("window_start", "category", "n").foreach(requireCol(counts, _, "driftPerWindow"))
    // re-alias the counts attributes so the wins-side self-reference
    // cannot produce conflicting exprIds (memory-sink sources trip the
    // usual auto-dedup)
    val c = counts.select(col("window_start").as("__cw"),
      col("category").as("__cc"), col("n").cast("long").as("__cn"))
    val grid = c.select(col("__cw").as("window_start")).distinct()
      .crossJoin(broadcast(refProportions))
    val j = grid.join(c,
        col("window_start") === col("__cw") && col("category") === col("__cc"),
        "left")
      .select(col("window_start"), col("category"), col("p_ref"),
        coalesce(col("__cn"), lit(0L)).as("n"))
    val tot = j.groupBy("window_start")
      .agg(sum("n").as("__t"), count(lit(1)).as("__k"))
    j.join(tot, "window_start")
      .withColumn("__p_cur", (col("n") + eps) / (col("__t") + col("__k") * eps))
      .groupBy("window_start")
      .agg(round(sum((col("__p_cur") - col("p_ref"))
          * log(col("__p_cur") / col("p_ref"))), 6).as("psi"),
        sum("n").as("n_events"))
  }

  /** One-row summary gate: total PSI, KL(cur‖ref), chi-square statistic
    * (expected counts from smoothed ref proportions), and the category
    * count. The conventional read: PSI < 0.1 stable, 0.1–0.25 drifting,
    * > 0.25 shifted. */
  def driftSummary(
      ref: DataFrame,
      cur: DataFrame,
      keyCol: String,
      eps: Double = 1e-6): DataFrame = {
    val per = categoricalDrift(ref, cur, keyCol, eps)
    val totals = per.agg(sum("n_cur").as("__t_cur"))
    per.crossJoin(broadcast(totals))
      .withColumn("__e", col("__t_cur") * col("p_ref"))
      .agg(
        round(sum("psi_term"), 6).as("psi"),
        round(sum("kl_term"), 6).as("kl_divergence"),
        round(sum(pow(col("n_cur") - col("__e"), 2) / col("__e")), 6).as("chi2"),
        count(lit(1)).as("n_categories"))
  }

  /** EXACT two-sample Kolmogorov-Smirnov statistic
    * `D = sup_x |F_ref(x) − F_cur(x)|` for a numeric column — the
    * binning-free complement to [[numericDrift]]'s PSI (PSI over fixed
    * bins can miss a pure location shift inside one bin; KS cannot).
    * One row: `(n_ref, n_cur, ks_stat)` (9 dp). Nulls are excluded.
    *
    * Scale shape: the naive formulation needs a cumulative sum over
    * ALL values in global order — `sum() OVER (ORDER BY v)` is a
    * single-partition window. Instead: reduce to per-DISTINCT-value
    * (n_ref, n_cur) counts (one grouped agg), then the same two-level
    * partition-offset pattern as [[graft.operators.Ids]]: range
    * repartition on the value, per-partition local cumulative sums in
    * parallel, per-partition totals (a numPartitions-sized frame)
    * prefix-summed and broadcast back. The range exchange over
    * distinct values is the only wide movement; the checkpoint fences
    * the ranged frame so both consumers see one set of range bounds. */
  def ksStatistic(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      distinctThreshold: Long = 16000000L): DataFrame = {
    requireCol(ref, valueCol, "ksStatistic(ref)")
    requireCol(cur, valueCol, "ksStatistic(cur)")
    import org.apache.spark.sql.expressions.Window
    val spark = ref.sparkSession
    import spark.implicits._
    def side(df: DataFrame, r: Long, c: Long) = df
      .select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .select(col("v"), lit(r).as("nr"), lit(c).as("nc"))
    // path selection reads only parquet metadata: raw row counts bound
    // the distinct-value count. No value-grain pre-pass, no cache, no
    // checkpoint — each of those costs a second materialisation that
    // measured SLOWER than the naive window (SCALE.md ks_path
    // iterations).
    val bound = ref.count() + cur.count()
    def g: DataFrame = side(ref, 1L, 0L).unionByName(side(cur, 0L, 1L))
      .groupBy("v").agg(sum("nr").as("nr"), sum("nc").as("nc"))
    if (bound <= distinctThreshold) {
      // small-cardinality regime: ONE task walking the value-grain
      // rows in order beats any distributed cumsum (the range
      // exchange alone re-samples the agg). Totals come from a
      // whole-frame window over the SAME single partition — the
      // entire statistic is one job, one lineage, one consumption.
      val w = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // totals via a second consumption of the SAME canonical agg
      // subplan: AQE plans a ReusedExchange for the broadcast branch,
      // so the value agg is shuffled once (an in-query whole-frame
      // window column measured +12 MB — it rides the singleton
      // exchange at full width)
      val totals = g.agg(
        coalesce(sum("nr"), lit(0L)).as("__tr"),
        coalesce(sum("nc"), lit(0L)).as("__tc"))
      val row = g
        .withColumn("__cr", sum("nr").over(w))
        .withColumn("__cc", sum("nc").over(w))
        .crossJoin(broadcast(totals))
        .agg(
          coalesce(first(col("__tr")), lit(0L)).as("n_ref"),
          coalesce(first(col("__tc")), lit(0L)).as("n_cur"),
          max(when(col("__tr") > 0 && col("__tc") > 0, abs(
            col("__cr").cast("double") / col("__tr") -
              col("__cc").cast("double") / col("__tc")))).as("sup"))
        .head()
      val (tr0, tc0) = (row.getLong(0), row.getLong(1))
      val sup0 =
        if (tr0 == 0L || tc0 == 0L || row.isNullAt(2)) Option.empty[Double]
        else Some(BigDecimal(row.getDouble(2))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      return Seq((tr0, tc0, sup0)).toDF("n_ref", "n_cur", "ks_stat")
    }
    // beyond one task's capacity — totals via two counted scans, then
    // the four-number partition reduction below
    val tr = ref.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull).count()
    val tc = cur.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull).count()
    if (tr == 0L || tc == 0L)
      return Seq((tr, tc, Option.empty[Double]))
        .toDF("n_ref", "n_cur", "ks_stat")
    val sup =
        {
          // beyond one task's capacity: range-exchange the values and
          // reduce each partition to FOUR numbers in one pass. With
          // the partition offset pending, every local deviation shifts
          // by the same per-partition constant, so sup|d_i + shift_p|
          // is attained at the partition's max or min d_i — no
          // offsets join back over the data, no checkpoint.
          val nParts = spark.sparkContext.defaultParallelism
          val wLocal = Window.partitionBy("__pid").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val perPart = g
            .repartitionByRange(nParts, col("v"))
            .withColumn("__pid", spark_partition_id())
            .withColumn("__cr", sum("nr").over(wLocal))
            .withColumn("__cc", sum("nc").over(wLocal))
            .withColumn("__d",
              col("__cr").cast("double") / tr -
                col("__cc").cast("double") / tc)
            .groupBy("__pid")
            .agg(
              max_by(struct(col("__cr"), col("__cc")), col("__d")).as("atMax"),
              min_by(struct(col("__cr"), col("__cc")), col("__d")).as("atMin"),
              sum("nr").as("pr"), sum("nc").as("pc"))
            .orderBy("__pid")
            .collect()
          var offR = 0L
          var offC = 0L
          var s = 0.0
          perPart.foreach { r =>
            // exact re-evaluation at the two candidates: global
            // integer cumsums divided once — the arithmetic a global
            // cumsum (and the SQL oracle) performs
            for (cand <- Seq(r.getStruct(r.fieldIndex("atMax")),
                r.getStruct(r.fieldIndex("atMin")))) {
              val d = math.abs(
                (cand.getLong(0) + offR).toDouble / tr -
                  (cand.getLong(1) + offC).toDouble / tc)
              s = math.max(s, d)
            }
            offR += r.getAs[Long]("pr")
            offC += r.getAs[Long]("pc")
          }
          s
        }
    val rounded = BigDecimal(sup)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((tr, tc, Some(rounded))).toDF("n_ref", "n_cur", "ks_stat")
  }

  /** EMBEDDING drift — the drift family extended to vector columns:
    * compare a current embedding set against a reference via (a) the
    * cosine between the two mean vectors (semantic-centre shift — the
    * first thing that moves when an upstream encoder or corpus mix
    * changes) and (b) the mean L2 norms of each side (scale/collapse
    * shift, invisible to the centroid cosine). Route the per-row norm
    * through [[numericDrift]] for a binned PSI when a distributional
    * read is needed; this op is the cheap always-on monitor.
    *
    * Scale shape: per-row norms are a narrow projection; each centroid
    * is ONE exchange at DIMENSION cardinality (dim rows, whatever the
    * corpus size); the final combine crosses three ≤dim-row frames.
    * An empty side yields null metrics (nothing to compare) rather
    * than throwing — callers gate on n_ref/n_cur.
    *
    * Output (one row): n_ref, n_cur, centroid_cosine, mean_norm_ref,
    * mean_norm_cur (round 6). */
  def embeddingDrift(
      ref: DataFrame,
      cur: DataFrame,
      vecCol: String): DataFrame = {
    def parts(df: DataFrame, tag: String): (DataFrame, DataFrame) = {
      val v = col(vecCol).cast("array<double>")
      val perRow = df.select(v.as("__ed_v"),
        // codegen'd Σx² kernel — the interpreted HOF fold
        // `aggregate(v, 0D, (a, x) => a + x*x)` walked the evaluator
        // per element; bit-identical (same IEEE add order, null
        // element nulls the fold) — DriftSpec pins parity
        sqrt(org.apache.spark.sql.graft.ColumnBridge(
          graft.functions.SumSquaresExpr(
            org.apache.spark.sql.graft.ColumnBridge.expression(v))))
          .as("__ed_n"))
      val scalar = perRow.agg(count(lit(1)).as(s"n_$tag"),
        avg(col("__ed_n")).as(s"__ed_mn_$tag"))
      val centroid = perRow
        .select(posexplode(col("__ed_v")).as(Seq("__ed_p", "__ed_x")))
        .groupBy("__ed_p").agg(avg(col("__ed_x")).as(s"__ed_m_$tag"))
      (scalar, centroid)
    }
    val (sRef, cRef) = parts(ref, "ref")
    val (sCur, cCur) = parts(cur, "cur")
    val cos = cRef.join(cCur, "__ed_p")
      .agg((sum(col("__ed_m_ref") * col("__ed_m_cur")) /
        (sqrt(sum(col("__ed_m_ref") * col("__ed_m_ref"))) *
          sqrt(sum(col("__ed_m_cur") * col("__ed_m_cur")))))
        .as("__ed_cos"))
    sRef.crossJoin(sCur).crossJoin(cos)
      .select(col("n_ref"), col("n_cur"),
        round(col("__ed_cos"), 6).as("centroid_cosine"),
        round(col("__ed_mn_ref"), 6).as("mean_norm_ref"),
        round(col("__ed_mn_cur"), 6).as("mean_norm_cur"))
  }
}
