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
}
