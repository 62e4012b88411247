package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, TimestampType}

/** As-of (nearest-timestamp-match) join — an operator Spark's
  * built-ins do not express directly.
  *
  * Semantics (pandas merge_asof directions, DuckDB ASOF JOIN):
  *  - `backward` (default): attach the right row with the LARGEST
  *    right timestamp ≤ the left timestamp within the same key;
  *  - `forward`: the SMALLEST right timestamp ≥ the left timestamp;
  *  - `nearest`: whichever of the two is closer in time (ties →
  *    backward, matching pandas).
  * Optional `tolerance` (seconds) nulls matches further away than the
  * window.
  *
  * Right rows DUPLICATED on (key, ts): exactly one attaches, but which
  * of the equal rows is unspecified (they tie in the window sort, and
  * engine sort ties are not stable) — pre-aggregate the right side to
  * (key, ts) grain if the choice matters. Everything else is
  * deterministic (AsOfJoinSpec + the PropertySpec reference fuzz).
  *
  * Implementation: union the two sides with a side marker, pack each
  * right row's timestamp + payload into ONE struct, then one window
  * pass per key taking the last non-null struct over a RUNNING
  * [unboundedPreceding, currentRow] frame — sorted ascending for
  * backward, descending for forward, so both directions execute as
  * O(n) incremental frames (never the per-row-recomputed
  * UnboundedFollowing frame, which is O(n^2) per key partition) —
  * side ordering puts right rows inside the frame at equal
  * timestamps so exact ties match. Filling a single struct (rather
  * than per-column last(ignoreNulls)) attaches the whole matched row
  * atomically: a payload value that is NULL in the matched right row
  * stays NULL instead of being backfilled from another row, matching
  * DuckDB/pandas ASOF semantics. Cost: ONE shuffle on the key columns
  * (nearest adds a second window SORT over the same exchange, not a
  * second shuffle), no per-row lookups, no broadcast of either side —
  * the shape that survives a 100 TB left side. Skewed keys can be
  * pre-salted only if right payloads are replicated per salt; prefer
  * AQE skew handling on the single exchange.
  */
object AsOfJoin {

  val directions: Set[String] = Set("backward", "forward", "nearest")

  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      rightPayloadCols: Seq[String],
      tolerance: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(keyCols.nonEmpty, "asOfJoin: need at least one key column")
    require(rightPayloadCols.nonEmpty, "asOfJoin: need right payload columns")
    require(directions.contains(direction),
      s"asOfJoin: direction '$direction' must be one of ${directions.mkString(", ")}")
    val leftCols = left.columns.toSeq
    require(!rightPayloadCols.exists(leftCols.contains),
      s"asOfJoin: right payload columns ${rightPayloadCols.mkString(", ")} collide with left side")
    val reserved = Seq("__side", "__match", "__mb", "__mf")
    require(!(leftCols ++ rightPayloadCols).exists(reserved.contains),
      s"asOfJoin: column names ${reserved.mkString(", ")} are reserved")

    // the whole matched right row travels as one struct so it is
    // attached (or not) atomically, nulls included
    val matchType = StructType(
      StructField("__r_ts", TimestampType) +:
        rightPayloadCols.map(c => StructField(c, right.schema(c).dataType)))

    // side marker: right=0. Backward orders (ts asc, side asc) and
    // forward orders (ts desc, side asc) — either way equal-ts right
    // rows fall INSIDE the running frame of a left row.
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
    val wBack = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Forward is the backward pass on the REVERSED sort: ts descending,
    // right rows (side 0) before left at equal ts so exact ties stay in
    // the running frame. Both directions therefore execute as
    // [unboundedPreceding, currentRow] running frames, which Spark
    // evaluates incrementally in O(n) per partition — a
    // [currentRow, unboundedFollowing] frame would recompute the
    // aggregate from scratch per row (O(n^2) per key partition).
    val wFwd = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // fractional-second timestamp for distance comparisons
    def secs(c: Column): Column = c.cast("double")

    val filled = (direction match {
      case "backward" =>
        unioned.withColumn("__match",
          last(col("__match"), ignoreNulls = true).over(wBack))
      case "forward" =>
        unioned.withColumn("__match",
          last(col("__match"), ignoreNulls = true).over(wFwd))
      case "nearest" =>
        unioned
          .withColumn("__mb", last(col("__match"), ignoreNulls = true).over(wBack))
          .withColumn("__mf", last(col("__match"), ignoreNulls = true).over(wFwd))
          .withColumn("__match",
            when(col("__mb").isNull, col("__mf"))
              .when(col("__mf").isNull, col("__mb"))
              .when((secs(col("__mf")("__r_ts")) - secs(col(tsCol))) <
                (secs(col(tsCol)) - secs(col("__mb")("__r_ts"))), col("__mf"))
              .otherwise(col("__mb"))) // tie → backward, as pandas
          .drop("__mb", "__mf")
    }).filter(col("__side") === 1)

    val matched = tolerance match {
      case Some(sec) =>
        val stale = col("__match").isNull ||
          abs(secs(col(tsCol)) - secs(col("__match")("__r_ts"))) > sec
        filled.withColumn("__match",
          when(stale, lit(null).cast(matchType)).otherwise(col("__match")))
      case None => filled
    }
    val unpacked = rightPayloadCols.foldLeft(matched)((d, c) =>
      d.withColumn(c, col("__match")(c)))
    unpacked.drop("__side", "__match")
  }
}
