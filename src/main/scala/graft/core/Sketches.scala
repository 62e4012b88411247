package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ColumnNotInDataframeError

/** Persistable distinct-count sketches (Apache DataSketches HLL via
  * Spark's `hll_sketch_agg` family): build per-group sketches once,
  * store them as binary columns in a state table, and MERGE them later
  * into any coarser grouping — the incremental pattern that maintains
  * "distinct users per week/month/all-time" over 100 TB without ever
  * rescanning history. Merging carries NO accuracy penalty: the
  * DataSketches union is register-wise max at full precision, so the
  * merged estimate has the same error bar (~1.04/√2^lgK ≈ 1.6% at the
  * default lgK 12) as sketching the union in one pass. It is NOT
  * bit-identical to the one-pass sketch, though — small sketches
  * count exactly in sparse mode, and the union's promotion to dense
  * HLL happens on a different schedule than the one-pass sketch's
  * (measured in SketchesSpec: 796 vs 789 on a true ≈798) — so audit
  * roll-ups against the error bar, not equality.
  *
  * Scale shape: `sketch` is one partial/final grouped aggregation
  * whose shuffle rows are fixed-width sketches (≤ 2^lgK registers),
  * never value sets; `merge` aggregates sketch rows at group
  * cardinality. Compare `Expectations`' isolated exact-distinct pass:
  * this is the path you take when 1-2% error buys you a scan over
  * yesterday only.
  */
object Sketches {

  private def check(df: DataFrame, cols: Seq[String], what: String): Unit = {
    val missing = cols.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw new ColumnNotInDataframeError(
        s"$what: column(s) ${missing.mkString(", ")} not in dataframe " +
          s"(has: ${df.columns.mkString(", ")})")
  }

  /** One binary HLL sketch of `valueCol`'s distinct values per group
    * (column `sketchCol`) — the storable state-table row. */
  def hllSketches(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lgConfigK: Int = 12,
      sketchCol: String = "hll_sketch"): DataFrame = {
    require(lgConfigK >= 4 && lgConfigK <= 21,
      s"hllSketches: lgConfigK must be in [4, 21], got $lgConfigK")
    check(df, groupCols :+ valueCol, "hllSketches")
    val agg = hll_sketch_agg(col(valueCol), lit(lgConfigK)).as(sketchCol)
    if (groupCols.isEmpty) df.agg(agg)
    else df.groupBy(groupCols.map(col): _*).agg(agg)
  }

  /** Union finer-grained sketches into coarser groups (e.g. daily →
    * monthly): one aggregation over sketch rows, input size = fine
    * group cardinality. All inputs must share a lgConfigK — a silent
    * downgrade union would quietly widen the error bar, so mixed
    * precisions throw (Spark's default strict mode). */
  def mergeSketches(
      df: DataFrame,
      groupCols: Seq[String],
      sketchCol: String = "hll_sketch"): DataFrame = {
    check(df, groupCols :+ sketchCol, "mergeSketches")
    val agg = hll_union_agg(col(sketchCol)).as(sketchCol)
    if (groupCols.isEmpty) df.agg(agg)
    else df.groupBy(groupCols.map(col): _*).agg(agg)
  }

  /** Decode sketches to their distinct-count estimate (long column
    * `outCol`, sketch column retained — re-estimating is free, the
    * sketch is the asset). */
  def withEstimate(
      df: DataFrame,
      sketchCol: String = "hll_sketch",
      outCol: String = "approx_distinct"): DataFrame = {
    check(df, Seq(sketchCol), "withEstimate")
    df.withColumn(outCol, hll_sketch_estimate(col(sketchCol)))
  }
}
