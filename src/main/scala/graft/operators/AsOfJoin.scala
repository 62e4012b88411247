package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, TimestampType}

/** As-of (most-recent-match) join — an operator Spark's built-ins do
  * not express directly.
  *
  * Semantics: for every left row, attach the payload of the right row
  * with the LARGEST right timestamp ≤ the left timestamp within the
  * same key (DuckDB/kdb ASOF JOIN, pandas merge_asof backward mode).
  * Optional `tolerance` (seconds) nulls matches older than the window.
  *
  * Implementation: union the two sides with a side marker, pack each
  * right row's timestamp + payload into ONE struct, then one window
  * pass per key ordered by (ts, side) taking the last non-null struct
  * — right rows sort BEFORE left rows at equal timestamps so
  * exact-tie matches are included. Filling a single struct (rather
  * than per-column last(ignoreNulls)) attaches the whole matched row
  * atomically: a payload value that is NULL in the most recent right
  * row stays NULL instead of being backfilled from an older row,
  * matching DuckDB/pandas ASOF semantics. Cost: ONE shuffle on the
  * key columns, no per-row lookups, no broadcast of either side — the
  * shape that survives a 100 TB left side. Skewed keys can be
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
    val reserved = Seq("__side", "__match")
    require(!(leftCols ++ rightPayloadCols).exists(reserved.contains),
      s"asOfJoin: column names ${reserved.mkString(", ")} are reserved")

    // the whole matched right row travels as one struct so it is
    // attached (or not) atomically, nulls included
    val matchType = StructType(
      StructField("__r_ts", TimestampType) +:
        rightPayloadCols.map(c => StructField(c, right.schema(c).dataType)))

    // side marker: right=0 sorts before left=1 at equal timestamps
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__match", lit(null).cast(matchType))

    val rSel = right.select(
      (keyCols.map(col) :+ col(tsCol)) ++ rightPayloadCols.map(col): _*)
    val rTagged = leftCols.filterNot((keyCols :+ tsCol).contains)
      .foldLeft(rSel)((d, c) =>
        d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .withColumn("__side", lit(0))
      .withColumn("__match", struct(
        col(tsCol).cast("timestamp").as("__r_ts") +:
          rightPayloadCols.map(col): _*))
      .select(l.columns.map(col): _*)

    val unioned = l.unionByName(rTagged)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = unioned
      .withColumn("__match", last(col("__match"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val matched = tolerance match {
      case Some(sec) =>
        val stale = col("__match").isNull ||
          (unix_timestamp(col(tsCol)) -
            unix_timestamp(col("__match")("__r_ts"))) > sec
        filled.withColumn("__match",
          when(stale, lit(null).cast(matchType)).otherwise(col("__match")))
      case None => filled
    }
    val unpacked = rightPayloadCols.foldLeft(matched)((d, c) =>
      d.withColumn(c, col("__match")(c)))
    unpacked.drop("__side", "__match")
  }
}
