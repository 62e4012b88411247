package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ColumnNotInDataframeError

/** Mergeable aggregate-state tables: the incremental-pipeline
  * primitive. `build` reduces a raw batch (one day, one partition) to
  * one STATE row per group — count, sum, min, max, and an HLL distinct
  * sketch — that is STORABLE in parquet; `merge` folds state rows into
  * any coarser grouping (day → month → all-time); `finish` decodes
  * states into the final metrics (mean computed at finish time from
  * sum/count, never averaged across states — averaging averages is the
  * classic roll-up bug). count/sum/min/max merge EXACTLY; the distinct
  * estimate carries HLL's error bar (see [[Sketches]]).
  *
  * Why it matters at 100 TB: yesterday's raw data is never rescanned.
  * Each day contributes a state table at group cardinality, and every
  * coarser report (weekly, monthly, lifetime) is an aggregation OVER
  * STATES — input size = days × groups, not corpus rows. The same
  * algebra is what Spark's own partial aggregation does inside one
  * query; this materialises it ACROSS pipeline runs.
  */
object AggState {

  private val stateCols =
    Seq("state_n", "state_sum", "state_min", "state_max", "state_hll")

  private def check(df: DataFrame, cols: Seq[String], what: String): Unit = {
    val missing = cols.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw new ColumnNotInDataframeError(
        s"$what: column(s) ${missing.mkString(", ")} not in dataframe " +
          s"(has: ${df.columns.mkString(", ")})")
  }

  /** One state row per group from raw data: `state_n` counts non-null
    * values, `state_sum`/`state_min`/`state_max` over `valueCol`,
    * `state_hll` a distinct sketch of it. One partial/final grouped
    * aggregation; shuffle rows are states, not values. */
  def build(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lgConfigK: Int = 12): DataFrame = {
    require(groupCols.nonEmpty, "AggState.build: need at least one group column")
    check(df, groupCols :+ valueCol, "AggState.build")
    val v = col(valueCol).cast("double")
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(v).as("state_n"),
        sum(v).as("state_sum"),
        min(v).as("state_min"),
        max(v).as("state_max"),
        // sketch the canonical string form: hll_sketch_agg accepts
        // int/long/string/binary only, and the string rep is injective
        // for the numeric/categorical columns states are built over
        hll_sketch_agg(col(valueCol).cast("string"), lit(lgConfigK))
          .as("state_hll"))
  }

  /** Fold state rows into coarser groups (`coarserCols` ⊆ the build
    * grouping): counts/sums add, min/max take extrema, sketches union.
    * Input size = fine-group cardinality — raw data is not touched. */
  def merge(states: DataFrame, coarserCols: Seq[String]): DataFrame = {
    require(coarserCols.nonEmpty, "AggState.merge: need at least one group column")
    check(states, coarserCols ++ stateCols, "AggState.merge")
    states.groupBy(coarserCols.map(col): _*)
      .agg(
        sum(col("state_n")).as("state_n"),
        sum(col("state_sum")).as("state_sum"),
        min(col("state_min")).as("state_min"),
        max(col("state_max")).as("state_max"),
        hll_union_agg(col("state_hll")).as("state_hll"))
  }

  /** Decode states to final metrics: n, sum, min, max, mean (6 dp,
    * null for empty states) and the distinct estimate. */
  def finish(states: DataFrame): DataFrame = {
    check(states, stateCols, "AggState.finish")
    states
      .withColumn("n", col("state_n"))
      .withColumn("sum", round(col("state_sum"), 6))
      .withColumn("min", col("state_min"))
      .withColumn("max", col("state_max"))
      .withColumn("mean",
        when(col("state_n") > 0, round(col("state_sum") / col("state_n"), 6)))
      .withColumn("approx_distinct", hll_sketch_estimate(col("state_hll")))
      .drop(stateCols: _*)
  }
}
