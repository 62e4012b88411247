package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — an operator Spark's built-ins do
  * not express directly.
  *
  * Semantics: for every left row, attach the payload of the right row
  * with the LARGEST right timestamp ≤ the left timestamp within the
  * same key (DuckDB/kdb ASOF JOIN, pandas merge_asof backward mode).
  * Optional `tolerance` (seconds) nulls matches older than the window.
  *
  * Implementation: union the two sides with a side marker, then one
  * window pass per key ordered by (ts, side) taking the last non-null
  * right payload — right rows sort BEFORE left rows at equal
  * timestamps so exact-tie matches are included. Cost: ONE shuffle on
  * the key columns, no per-row lookups, no broadcast of either side —
  * the shape that survives a 100 TB left side. Skewed keys can be
  * pre-salted only if right payloads are replicated per salt; prefer
  * AQE skew handling on the single exchange.
  */
object AsOfJoin {

  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      rightPayloadCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "asOfJoin: need at least one key column")
    require(rightPayloadCols.nonEmpty, "asOfJoin: need right payload columns")
    val leftCols = left.columns.toSeq
    require(!rightPayloadCols.exists(leftCols.contains),
      s"asOfJoin: right payload columns ${rightPayloadCols.mkString(", ")} collide with left side")
    val reserved = Seq("__side", "__r_ts", "__match_ts")
    require(!(leftCols ++ rightPayloadCols).exists(reserved.contains),
      s"asOfJoin: column names ${reserved.mkString(", ")} are reserved")

    // side marker: right=0 sorts before left=1 at equal timestamps
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__r_ts", lit(null).cast("timestamp"))
    val lWithNullPayload = rightPayloadCols.foldLeft(l)((d, c) =>
      d.withColumn(c, lit(null).cast(
        right.schema(c).dataType)))

    val rSel = right.select(
      (keyCols.map(col) :+ col(tsCol)) ++ rightPayloadCols.map(col): _*)
    val rTagged = leftCols.filterNot((keyCols :+ tsCol).contains)
      .foldLeft(rSel)((d, c) =>
        d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .withColumn("__side", lit(0))
      .withColumn("__r_ts", col(tsCol))
      .select(lWithNullPayload.columns.map(col): _*)

    val unioned = lWithNullPayload.unionByName(rTagged)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rightPayloadCols.foldLeft(unioned)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
      .withColumn("__match_ts", last(col("__r_ts"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val withTolerance = tolerance match {
      case Some(sec) =>
        val stale = col("__match_ts").isNull ||
          (unix_timestamp(col(tsCol)) - unix_timestamp(col("__match_ts"))) > sec
        rightPayloadCols.foldLeft(filled)((d, c) =>
          d.withColumn(c, when(stale, lit(null)).otherwise(col(c))))
      case None => filled
    }
    withTolerance.drop("__side", "__r_ts", "__match_ts")
  }
}
