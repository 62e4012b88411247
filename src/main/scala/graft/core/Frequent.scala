package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** Heavy hitters in bounded memory: a Misra-Gries summary as a typed
  * Spark [[Aggregator]]. One pass, O(k) state per group, mergeable —
  * the exact-top-k alternative (groupBy item + global sort) shuffles a
  * row PER DISTINCT ITEM, which at 100 TB of high-cardinality keys is
  * itself a giant table; this shuffles k counters per map task and
  * never materialises the long tail.
  *
  * Contract (Misra-Gries '82; merge per Agarwal et al., "Mergeable
  * Summaries", PODS'12): with capacity k over n rows, every reported
  * count satisfies `est <= true <= est + n/(k+1)`, and every item with
  * true frequency > n/(k+1) is guaranteed to be reported. The
  * frequency THRESHOLD is the contract; ranks among near-ties are not.
  *
  * Works unchanged as a streaming aggregation (update mode): the
  * engine keeps the k-sized buffer as grouped state and merges each
  * micro-batch's partials — the same mergeability that makes the
  * batch shuffle bounded.
  */
object Frequent {

  /** One survivor counter. */
  case class MgEntry(item: String, cnt: Long)

  /** Bounded counter set (≤ k entries). */
  case class MgBuffer(items: Seq[MgEntry])

  /** Misra-Gries aggregator over string items with capacity `k`. */
  class MisraGries(k: Int)
      extends Aggregator[String, MgBuffer, Seq[MgEntry]] {
    require(k > 0, s"MisraGries: k must be positive, got $k")

    override def zero: MgBuffer = MgBuffer(Vector.empty)

    override def reduce(b: MgBuffer, item: String): MgBuffer = {
      val idx = b.items.indexWhere(_.item == item)
      if (idx >= 0)
        MgBuffer(b.items.updated(idx, MgEntry(item, b.items(idx).cnt + 1)))
      else if (b.items.size < k)
        MgBuffer(b.items :+ MgEntry(item, 1L))
      else
        // classic decrement step: new item cancels one unit of every
        // counter; zeroed counters free their slot
        MgBuffer(b.items.map(e => e.copy(cnt = e.cnt - 1)).filter(_.cnt > 0))
    }

    override def merge(b1: MgBuffer, b2: MgBuffer): MgBuffer = {
      val combined = (b1.items ++ b2.items)
        .groupBy(_.item).map { case (i, es) => MgEntry(i, es.map(_.cnt).sum) }
        .toVector
      if (combined.size <= k) MgBuffer(combined)
      else {
        // subtract the (k+1)-th largest count from everything — the
        // PODS'12 merge that preserves the n/(k+1) error bound
        val d = combined.map(_.cnt).sorted(Ordering[Long].reverse)(k)
        MgBuffer(combined.map(e => e.copy(cnt = e.cnt - d)).filter(_.cnt > 0))
      }
    }

    override def finish(r: MgBuffer): Seq[MgEntry] =
      r.items.sortBy(e => (-e.cnt, e.item))

    override def bufferEncoder: Encoder[MgBuffer] = Encoders.product[MgBuffer]
    override def outputEncoder: Encoder[Seq[MgEntry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Whole-table heavy hitters on `itemCol` (nulls surface as
    * "(null)"): one row per surviving counter — `(item, est_count,
    * rank)`, best-first with (−cnt, item) tie-break. */
  def frequentItems(df: DataFrame, itemCol: String, k: Int): DataFrame =
    frequentItemsByKey(df, Nil, itemCol, k)

  /** Per-group heavy hitters: `groupCols` keys the summaries. */
  def frequentItemsByKey(
      df: DataFrame,
      groupCols: Seq[String],
      itemCol: String,
      k: Int): DataFrame = {
    val missing = (groupCols :+ itemCol).filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw new graft.ColumnNotInDataframeError(
        s"frequentItems: column(s) ${missing.mkString(", ")} not in dataframe")
    val mg = udaf(new MisraGries(k))
    val item = coalesce(col(itemCol).cast("string"), lit("(null)"))
    val keyed = df.select(groupCols.map(col) :+ item.as("__item"): _*)
    val grouped =
      if (groupCols.isEmpty) keyed.groupBy()
      else keyed.groupBy(groupCols.map(col): _*)
    grouped.agg(mg(col("__item")).as("__mg"))
      .select(groupCols.map(col) :+ posexplode(col("__mg")).as(Seq("__pos", "__e")): _*)
      .select(groupCols.map(col) ++ Seq(col("__e.item").as("item"),
        col("__e.cnt").as("est_count"),
        (col("__pos") + 1).cast("int").as("rank")): _*)
  }

  /** Verification harness for the MG contract, itself distributed:
    * joins the summary against exact counts (the expensive ground truth
    * a production run would NOT compute) and reports, as one row —
    * `within_k` (summary size ≤ k), `n_heavy` (items with true count
    * > n/(k+1)), `n_heavy_missing` (heavy items absent from the
    * summary; contractually 0), `overcount_violations` (est > true;
    * contractually 0), `bound_violations` (true − est > n/(k+1);
    * contractually 0). */
  def checkGuarantee(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    val reported = frequentItems(df, itemCol, k)
    val item = coalesce(col(itemCol).cast("string"), lit("(null)"))
    val exact = df.select(item.as("item"))
      .groupBy("item").agg(count(lit(1)).as("true_count"))
    val n = df.count().toDouble
    val bound = n / (k + 1)
    exact.join(reported.select(col("item"), col("est_count")), Seq("item"), "left")
      .agg(
        (sum(when(col("est_count").isNotNull, 1L).otherwise(0L)) <= k)
          .as("within_k"),
        sum(when(col("true_count") > bound, 1L).otherwise(0L)).as("n_heavy"),
        sum(when(col("true_count") > bound && col("est_count").isNull, 1L)
          .otherwise(0L)).as("n_heavy_missing"),
        sum(when(col("est_count") > col("true_count"), 1L).otherwise(0L))
          .as("overcount_violations"),
        sum(when(col("true_count") - coalesce(col("est_count"), lit(0L)) > bound,
          1L).otherwise(0L)).as("bound_violations"))
  }
}
