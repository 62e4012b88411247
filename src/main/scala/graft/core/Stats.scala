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
}
