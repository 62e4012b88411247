package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series shaping over an event stream: bucket to a
  * fixed interval, materialise the missing buckets (gap fill), and
  * forward-fill carried values — the transform that turns irregular
  * event logs into the dense per-interval series downstream joins and
  * window features expect.
  *
  * Scale shape: one hash aggregation on (key, bucket) with map-side
  * combine; the spine is generated per KEY from that aggregate's
  * bounds (`sequence` + explode — rows ≈ keys × buckets, never a
  * driver loop); the gap join is an equi-join on (key, bucket); the
  * forward fill is one window sort per key. Partitioning is by series
  * key throughout — a 100 TB event log with many keys spreads evenly,
  * while a single giant series is inherently one partition's sort
  * (document upstream splitting by time range if that bites).
  */
object TimeSeries {

  /** Aggregate `df` into `intervalSec` buckets per `keyCol` and fill
    * every missing bucket between each key's first and last event.
    *
    * Output per (key, bucket): `bucket_start` (epoch seconds, long),
    * `n_events` (0 on gaps), `sum_value` (0.0 on gaps), `ffill_value`
    * (bucket sum carried forward over gaps — the last observed
    * bucket's sum). `tsCol` must be a TimestampType column (see
    * [[graft.core.DataFrameOps.normalizeEventTs]]). */
  def fillGaps(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      intervalSec: Long): DataFrame = {
    require(intervalSec > 0, s"fillGaps: intervalSec must be positive, got $intervalSec")
    val bucket = (floor(unix_timestamp(col(tsCol)) / intervalSec) * intervalSec).cast("long")
    val buckets = df
      .select(col(keyCol), bucket.as("bucket_start"), col(valueCol).cast("double").as("v"))
      .groupBy(keyCol, "bucket_start")
      .agg(count(lit(1)).as("n_events"), round(sum("v"), 6).as("sum_value"))
    val spine = buckets
      .groupBy(keyCol)
      .agg(min("bucket_start").as("lo"), max("bucket_start").as("hi"))
      .select(col(keyCol),
        explode(sequence(col("lo"), col("hi"), lit(intervalSec))).as("bucket_start"))
    val filled = spine.join(buckets, Seq(keyCol, "bucket_start"), "left")
    val w = Window.partitionBy(keyCol).orderBy("bucket_start")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled.select(col(keyCol), col("bucket_start"),
      coalesce(col("n_events"), lit(0L)).as("n_events"),
      coalesce(col("sum_value"), lit(0.0)).as("sum_value"),
      last("sum_value", ignoreNulls = true).over(w).as("ffill_value"))
  }

  /** Trailing time-range window features per series key: for every
    * event, the count and sum of `valueCol` over the inclusive
    * `[t − windowSec, t]` range of the same key — the standard
    * rolling-feature pass (rate limits, momentum, activity scores).
    *
    * The frame is a RANGE frame on epoch seconds, so simultaneous
    * events are in each other's frame regardless of intra-second
    * order — the result is deterministic without a tiebreak. One
    * exchange + sort per key, streamed frame evaluation (no per-row
    * self-join). */
  def rollingAgg(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      windowSec: Long,
      extraCols: Seq[String] = Nil): DataFrame = {
    require(windowSec > 0, s"rollingAgg: windowSec must be positive, got $windowSec")
    val w = Window.partitionBy(keyCol).orderBy(col("__graft_epoch"))
      .rangeBetween(-windowSec, 0)
    df
      .withColumn("__graft_epoch", unix_timestamp(col(tsCol)))
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("sum_win", round(sum(col(valueCol).cast("double")).over(w), 6))
      .select((Seq(keyCol) ++ extraCols ++ Seq("__graft_epoch", "n_win", "sum_win")).map(col): _*)
      .withColumnRenamed("__graft_epoch", "epoch_s")
  }

  /** Assign gap-based session ids: an event opens a new session when
    * its gap from the previous event of the same key exceeds
    * `gapSec`; `session_id` is the 0-based running session count per
    * key (cumulative sum of the open flags — one exchange + sort per
    * key, the batch twin of the streaming session windows). */
  def sessionize(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gapSec: Long,
      orderCols: Seq[String] = Nil): DataFrame = {
    require(gapSec > 0, s"sessionize: gapSec must be positive, got $gapSec")
    val order = if (orderCols.isEmpty) Seq(tsCol) else orderCols
    val w = Window.partitionBy(keyCol).orderBy(order.map(col): _*)
    val prev = lag(unix_timestamp(col(tsCol)), 1).over(w)
    df
      .withColumn("__graft_new",
        when(prev.isNull || unix_timestamp(col(tsCol)) - prev > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum("__graft_new").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .drop("__graft_new")
  }

  /** Session-leading events: keep each event that OPENS a burst — the
    * first of its key, or any whose gap from the previous event of
    * the same key exceeds `gapSec`. The batch debounce/throttle that
    * pairs with the session-window streaming aggregations.
    *
    * `orderCols` must order events uniquely per key (append a
    * tiebreak id after the timestamp). One exchange + sort per key. */
  def sessionLeaders(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gapSec: Long,
      orderCols: Seq[String] = Nil): DataFrame = {
    require(gapSec > 0, s"sessionLeaders: gapSec must be positive, got $gapSec")
    val order = if (orderCols.isEmpty) Seq(tsCol) else orderCols
    val w = Window.partitionBy(keyCol).orderBy(order.map(col): _*)
    val prev = lag(unix_timestamp(col(tsCol)), 1).over(w)
    df
      .withColumn("__graft_gap_prev", prev)
      .filter(col("__graft_gap_prev").isNull ||
        unix_timestamp(col(tsCol)) - col("__graft_gap_prev") > gapSec)
      .drop("__graft_gap_prev")
  }
}
