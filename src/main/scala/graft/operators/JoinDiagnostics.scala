package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ColumnNotInDataframeError

/** Pre-flight join diagnostics: estimate a join's output size from
  * per-key multiplicities BEFORE running it, and fail fast when the
  * plan would explode. At 100 TB a many-to-many key you didn't know
  * about doesn't OOM politely — it runs for hours writing an
  * output quadratically larger than its inputs. Two grouped counts
  * (each reduces a corpus to key cardinality with partial
  * aggregation) and a join OF THE COUNT FRAMES answer "how big"
  * exactly, for the cost of two scans and a key-sized exchange.
  */
object JoinDiagnostics {

  private def counts(df: DataFrame, keys: Seq[String], side: String, as: String) = {
    val missing = keys.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw new ColumnNotInDataframeError(
        s"joinCardinality($side): column(s) ${missing.mkString(", ")} not in dataframe")
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as(as))
  }

  /** Per-key join contribution, heaviest first: one row per key value
    * present on BOTH sides (inner-join semantics — keys on one side
    * only contribute zero rows) with `n_left`, `n_right` and
    * `out_rows` = their product. `topN` bounds the result (ties broken
    * by the key for determinism). */
  def joinCardinalityByKey(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      topN: Int = 20): DataFrame = {
    require(keys.nonEmpty, "joinCardinalityByKey: keys must be non-empty")
    require(topN > 0, s"joinCardinalityByKey: topN must be positive, got $topN")
    counts(left, keys, "left", "n_left")
      .join(counts(right, keys, "right", "n_right"), keys)
      .withColumn("out_rows", col("n_left") * col("n_right"))
      .orderBy(col("out_rows").desc +: keys.map(col(_).asc): _*)
      .limit(topN)
  }

  /** Exact output row count of the prospective inner equi-join —
    * eager, reduced distributed (sum of per-key products; the driver
    * sees one number). */
  def estimateJoinOutputRows(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String]): Long = {
    val row = counts(left, keys, "left", "n_left")
      .join(counts(right, keys, "right", "n_right"), keys)
      .agg(coalesce(sum(col("n_left") * col("n_right")), lit(0L))).head()
    row.getLong(0)
  }

  /** Fail-fast guard: throws [[graft.PipelineError]] when the
    * prospective join's exact output exceeds `maxOutputRows`, naming
    * the heaviest keys. The two count scans are the insurance premium;
    * the avoided cost is a quadratic shuffle. */
  def requireJoinSafe(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      maxOutputRows: Long): Unit = {
    val est = estimateJoinOutputRows(left, right, keys)
    if (est > maxOutputRows) {
      val offenders = joinCardinalityByKey(left, right, keys, topN = 5)
        .collect()
        .map(r => keys.map(k => s"$k=${r.getAs[Any](k)}").mkString(",") +
          s" -> ${r.getAs[Long]("out_rows")}")
        .mkString("; ")
      throw new graft.PipelineError(
        s"join on (${keys.mkString(", ")}) would produce $est rows " +
          s"(max $maxOutputRows); heaviest keys: $offenders")
    }
  }
}
