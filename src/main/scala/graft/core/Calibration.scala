package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Calibration hygiene for model-based quality filters: when a corpus
  * is gated on a classifier score ("keep p(quality) > 0.8"), the
  * threshold only means what the RELIABILITY DIAGRAM says it means.
  * These operators compute the equal-width-bin reliability table and
  * the expected-calibration-error summary on (score, label) frames —
  * the artifact a filter-threshold review reads.
  *
  * Scale shape: one hash aggregation at BIN grain (`nBins` rows out,
  * map-side partials do the work) — scan-speed at any corpus size,
  * no window, no driver math beyond the nBins-row summary.
  */
object Calibration {

  /** Equal-width reliability table: for each of `nBins` bins over
    * [0,1), the row count, mean predicted score, and empirical
    * positive rate. Scores are clamped into [0,1]; score 1.0 joins
    * the top bin (the standard convention keeping bins exhaustive).
    * Returns (bin, n, mean_score, frac_positive) sorted by bin;
    * empty bins are absent (the plot treats them as gaps). */
  def reliabilityBins(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 1, s"reliabilityBins: nBins must be >= 1, got $nBins")
    val clamped = least(greatest(col(scoreCol).cast("double"), lit(0.0)), lit(1.0))
    val bin = least(floor(clamped * nBins), lit(nBins - 1L)).cast("long")
    df.withColumn("__graft_bin", bin)
      .groupBy(col("__graft_bin").as("bin"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(clamped), 6).as("mean_score"),
        round(avg(col(labelCol).cast("double")), 6).as("frac_positive"))
      .orderBy("bin")
  }

  /** Expected calibration error: Σ_bins (n_b / N) · |mean_score_b −
    * frac_positive_b|, over the same equal-width bins — the one-number
    * summary (plus max-bin gap, the "worst region" flag). */
  def expectedCalibrationError(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      nBins: Int = 10): DataFrame =
    reliabilityBins(df, scoreCol, labelCol, nBins)
      .agg(
        sum(col("n")).as("n_rows"),
        round(sum(col("n").cast("double") *
          abs(col("mean_score") - col("frac_positive"))) /
          sum(col("n").cast("double")), 6).as("ece"),
        round(max(abs(col("mean_score") - col("frac_positive"))), 6)
          .as("max_bin_gap"))
}
