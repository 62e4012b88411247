package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ColumnNotInDataframeError

/** Snapshot diff for incremental corpus pipelines: classify every id
  * across two corpus versions as added / removed / changed / unchanged
  * — the gate that decides how much of a 100 TB refresh actually needs
  * reprocessing.
  *
  * Scale shape: ONE full-outer shuffle join on the id (both sides hash
  * -partitioned once; AQE handles size asymmetry), with the compared
  * payload reduced to a struct BEFORE the join so the exchange carries
  * the compare columns once, not twice per accessor. The null-safe
  * struct equality (`<=>`) is a narrow codegen'd projection. Nothing
  * is collected; `diffSummary` reduces the statuses to four rows.
  */
object Diff {

  /** Per-id status frame: `(idCol, status)` with status in
    * added | removed | changed | unchanged. `compareCols` are the
    * payload columns whose change means "changed" (null-safe,
    * null == null is unchanged). */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiff: compareCols must be non-empty")
    def check(df: DataFrame, side: String): Unit = {
      val missing = (idCol +: compareCols).filterNot(df.columns.contains)
      if (missing.nonEmpty)
        throw new ColumnNotInDataframeError(
          s"snapshotDiff($side): column(s) ${missing.mkString(", ")} not in dataframe")
    }
    check(oldDf, "old"); check(newDf, "new")
    // a marker lit survives the outer join where a nullable payload
    // struct could be legitimately null on a present row
    val o = oldDf.select(col(idCol),
      struct(compareCols.map(col): _*).as("__o"), lit(1).as("__in_o"))
    val n = newDf.select(col(idCol),
      struct(compareCols.map(col): _*).as("__n"), lit(1).as("__in_n"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__in_o").isNull, "added")
          .when(col("__in_n").isNull, "removed")
          .when(col("__o") <=> col("__n"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Four-row reduction: `(status, n)`. */
  def diffSummary(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      compareCols: Seq[String]): DataFrame =
    snapshotDiff(oldDf, newDf, idCol, compareCols)
      .groupBy("status").agg(count(lit(1)).as("n"))
}
