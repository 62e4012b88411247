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
}
