package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust-statistics cleanup operators for corpus and metric columns:
  * percentile clipping (winsorization) and z-score outlier flagging —
  * the standard guards applied to quality signals and metric streams
  * before they feed sampling weights or training filters.
  *
  * Scale shape: both operators are ONE grouped aggregation over the
  * group keys producing a per-group row of bounds/moments, joined
  * back onto the input (group-count-sized side → AQE broadcasts it),
  * then a narrow projection. No window over the full table, no
  * per-row sort. `winsorize` uses exact interpolating percentiles —
  * per-group sort state; swap `exact = false` for the sketch path on
  * groups that don't fit (same contract as Aggregations.percentiles).
  */
object Stats {

  /** Clip `valueCol` to its per-group [lowP, highP] percentile range
    * (new column `<valueCol>_wins`). */
  def winsorize(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lowP: Double = 0.01,
      highP: Double = 0.99,
      exact: Boolean = true,
      accuracy: Int = 10000): DataFrame = {
    require(lowP >= 0 && highP <= 1 && lowP < highP,
      s"winsorize: need 0 <= lowP < highP <= 1, got ($lowP, $highP)")
    val v = col(valueCol).cast("double")
    def pct(p: Double) =
      if (exact) percentile(v, lit(p)) else percentile_approx(v, lit(p), lit(accuracy))
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(pct(lowP).as("__graft_lo"), pct(highP).as("__graft_hi"))
    df.join(bounds, groupCols)
      .withColumn(s"${valueCol}_wins",
        round(least(greatest(v, col("__graft_lo")), col("__graft_hi")), 6))
      .drop("__graft_lo", "__graft_hi")
  }

  /** Flag per-group z-score outliers: adds `z` (round 6; 0.0 when the
    * group's stddev is 0 or undefined) and `is_outlier`
    * (|z| > threshold). Sample stddev, matching SQL engines. */
  def zscoreOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      threshold: Double = 3.0): DataFrame = {
    require(threshold > 0, s"zscoreOutliers: threshold must be positive, got $threshold")
    val v = col(valueCol).cast("double")
    val moments = df.groupBy(groupCols.map(col): _*)
      .agg(avg(v).as("__graft_mu"), stddev_samp(v).as("__graft_sd"))
    df.join(moments, groupCols)
      .withColumn("z",
        when(col("__graft_sd").isNull || col("__graft_sd") === 0.0, 0.0)
          .otherwise(round((v - col("__graft_mu")) / col("__graft_sd"), 6)))
      .withColumn("is_outlier", abs(col("z")) > threshold)
      .drop("__graft_mu", "__graft_sd")
  }

  /** Fill nulls in `valueCol` with the per-group mean or (exact,
    * interpolated) median of the NON-NULL values — new column
    * `<valueCol>_imputed` (rounded 6 dp). Groups whose values are ALL
    * null stay null (no global fallback — that silent cross-group
    * leak is the bug imputation audits look for; run a global pass
    * with `groupCols = Nil` explicitly if that is what you want).
    *
    * Scale shape: a grouped aggregation to group cardinality + a join
    * back (AQE broadcasts the group-sized side) + a narrow coalesce —
    * NOT `avg(...).over(partitionBy(group))`, which shuffles the whole
    * corpus into one partition per group value and dies on
    * low-cardinality keys at scale. */
  def imputeNulls(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      strategy: String = "mean"): DataFrame = {
    val allowed = Set("mean", "median")
    require(allowed.contains(strategy),
      s"imputeNulls: strategy '$strategy' not in ${allowed.mkString(", ")}")
    val v = col(valueCol).cast("double")
    val fillExpr = if (strategy == "mean") avg(v) else percentile(v, lit(0.5))
    val out = s"${valueCol}_imputed"
    if (groupCols.isEmpty) {
      val fill = df.agg(fillExpr.as("__graft_fill"))
      df.crossJoin(broadcast(fill))
        .withColumn(out, round(coalesce(v, col("__graft_fill")), 6))
        .drop("__graft_fill")
    } else {
      val fills = df.groupBy(groupCols.map(col): _*)
        .agg(fillExpr.as("__graft_fill"))
      df.join(fills, groupCols, "left")
        .withColumn(out, round(coalesce(v, col("__graft_fill")), 6))
        .drop("__graft_fill")
    }
  }

  /** Equi-depth bucketing: adds `<valueCol>_bucket` in 0..numBuckets-1
    * from the column's own (per-group) quantile bounds. A value lands
    * in bucket = count of interior quantile bounds strictly below it —
    * ties at a bound go LOW, nulls get null.
    *
    * Scale shape: the bounds are ONE grouped aggregation producing a
    * (numBuckets-1)-element array per group, joined back (broadcast at
    * group cardinality) and applied as a narrow array fold — unlike
    * `ntile`, which sorts the whole corpus through one partition per
    * group. `exact = true` uses interpolated exact percentiles
    * (per-group sort state inside the agg); `exact = false` swaps the
    * sketch (`percentile_approx`), the 100 TB default. */
  def quantileDiscretize(
      df: DataFrame,
      valueCol: String,
      numBuckets: Int,
      groupCols: Seq[String] = Nil,
      exact: Boolean = true,
      accuracy: Int = 10000): DataFrame = {
    require(numBuckets >= 2,
      s"quantileDiscretize: numBuckets must be >= 2, got $numBuckets")
    val v = col(valueCol).cast("double")
    val ps = array((1 until numBuckets).map(i =>
      lit(i.toDouble / numBuckets)): _*)
    val boundsExpr =
      if (exact) percentile(v, ps) else percentile_approx(v, ps, lit(accuracy))
    val out = s"${valueCol}_bucket"
    val bucketOf = when(v.isNull, lit(null))
      .otherwise(size(filter(col("__graft_bounds"), b => v > b)))
    if (groupCols.isEmpty) {
      val bounds = df.agg(boundsExpr.as("__graft_bounds"))
      df.crossJoin(broadcast(bounds))
        .withColumn(out, bucketOf.cast("int")).drop("__graft_bounds")
    } else {
      val bounds = df.groupBy(groupCols.map(col): _*)
        .agg(boundsExpr.as("__graft_bounds"))
      df.join(bounds, groupCols)
        .withColumn(out, bucketOf.cast("int")).drop("__graft_bounds")
    }
  }

  /** Min-max scale `valueCol` into [0, 1] per group (new column
    * `<valueCol>_scaled`, 6 dp): (v − min) / (max − min); a
    * constant group (max = min) scales to 0.0 — the join-safe
    * convention. Same shape as [[winsorize]]: one grouped aggregate
    * to group cardinality, broadcast-friendly join back, narrow
    * projection — never a window over the corpus. */
  def minMaxScale(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(min(v).as("__graft_mn"), max(v).as("__graft_mx"))
    df.join(bounds, groupCols)
      .withColumn(s"${valueCol}_scaled",
        when(col("__graft_mx") === col("__graft_mn"), 0.0)
          .otherwise(round((v - col("__graft_mn")) /
            (col("__graft_mx") - col("__graft_mn")), 6)))
      .drop("__graft_mn", "__graft_mx")
  }

  /** Robust scale `valueCol` per group (new column
    * `<valueCol>_robust`, 6 dp): (v − median) / IQR with exact
    * interpolated quartiles; zero-IQR groups scale to 0.0. The
    * outlier-insensitive standardisation quality-signal columns
    * need before feeding sampling weights (a single spam doc moves
    * a mean/stddev z-score; it barely moves median/IQR). Same
    * aggregate-join-project shape as [[winsorize]]; swap
    * `exact = false` for the sketch path on groups that don't fit. */
  def robustScale(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      exact: Boolean = true,
      accuracy: Int = 10000): DataFrame = {
    val v = col(valueCol).cast("double")
    def pct(p: Double) =
      if (exact) percentile(v, lit(p)) else percentile_approx(v, lit(p), lit(accuracy))
    val qs = df.groupBy(groupCols.map(col): _*)
      .agg(pct(0.25).as("__graft_q1"), pct(0.5).as("__graft_med"),
        pct(0.75).as("__graft_q3"))
    df.join(qs, groupCols)
      .withColumn(s"${valueCol}_robust",
        when(col("__graft_q3") === col("__graft_q1"), 0.0)
          .otherwise(round((v - col("__graft_med")) /
            (col("__graft_q3") - col("__graft_q1")), 6)))
      .drop("__graft_q1", "__graft_med", "__graft_q3")
  }
}
