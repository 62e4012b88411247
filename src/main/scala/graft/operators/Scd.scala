package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history builder: collapse a
  * keyed change log into validity intervals, one row per state run,
  * with `valid_from` / `valid_to` bounds and an `is_current` flag —
  * the standard dimension-history shape for point-in-time joins.
  *
  * Scale shape: one exchange on the dimension key, one sort on
  * (key, orderCols); the change filter preserves partitioning AND
  * sort order, so the second window pass (the `lead` for interval
  * close) re-uses the same exchange+sort — the whole operator is a
  * single shuffle regardless of corpus size. No driver state, no
  * self-join against the previous snapshot.
  */
object Scd {

  /** Build type-2 intervals from a change log.
    *
    * @param keyCol    dimension key
    * @param orderCols change ordering — MUST be unique per key for a
    *                  deterministic history (pass a tiebreak column
    *                  after the timestamp when timestamps can collide)
    * @param attrCols  tracked attributes; a row opens a new interval
    *                  iff any attribute differs (null-safely) from the
    *                  previous row's
    *
    * Output: key, attrCols…, `valid_from` (first orderCol at open),
    * `valid_to` (next interval's open, null while current),
    * `is_current`. */
  def scdType2(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      attrCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "scdType2: need at least one ordering column")
    require(attrCols.nonEmpty, "scdType2: need at least one tracked attribute")
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    val changed: Column = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _) || row_number().over(w) === 1
    val tsCol = orderCols.head
    df
      .withColumn("__graft_changed", changed)
      .filter(col("__graft_changed"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCol +: attrCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /** Incrementally merge an update batch into an existing type-2
    * history — the production shape: a daily batch touches a sliver
    * of keys, so recomputing only the OPEN intervals plus the updates
    * beats rebuilding history from the full change log.
    *
    * Contract (append-only): every update row's `orderCols.head` must
    * be STRICTLY greater than its key's open `valid_from` — the
    * standard incremental-load invariant. Under it, this merge is
    * exactly equivalent to `scdType2` over the combined log
    * (q_scd2_merge pins that equivalence against the full-rebuild
    * oracle).
    *
    * Plan: closed intervals pass through untouched (no shuffle on the
    * history bulk beyond the union); each key's open interval is
    * re-expressed as its opening change event and re-run through
    * `scdType2` together with the updates — the windowed work is
    * sized by open-keys + batch, not by history. */
  def scdType2Merge(
      history: DataFrame,
      updates: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      attrCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "scdType2Merge: need at least one ordering column")
    val tsCol = orderCols.head
    val openEvents = orderCols.tail.foldLeft(
      history.filter(col("is_current"))
        .select((keyCol +: attrCols).map(col) :+ col("valid_from").as(tsCol): _*)) {
      // tiebreak columns are not retained in history output; the
      // append-only contract makes them irrelevant across the
      // boundary (strictly larger first order column), so typed
      // nulls — which sort FIRST ascending — stand in safely
      (d, c) => d.withColumn(c, lit(null).cast(updates.schema(c).dataType))
    }
    val cols = (keyCol +: orderCols) ++ attrCols
    val combined = openEvents.select(cols.map(col): _*)
      .unionByName(updates.select(cols.map(col): _*))
    history.filter(!col("is_current"))
      .unionByName(scdType2(combined, keyCol, orderCols, attrCols))
  }
}
