package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (SURVEY.md §2.11 — an extension beyond
  * the reference, which has no streaming).
  *
  * The aggregation builders work identically on batch DataFrames and
  * streaming DataFrames (same logical plan), so the batch oracle checks
  * validate the streaming semantics too.
  */
object Streaming {

  /** Tumbling-window aggregate: count + sum(value) per (window, key). */
  def tumblingAgg(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDuration: String): DataFrame =
    events
      .groupBy(window(col(tsCol), windowDuration), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(keyCol),
        col("n_events"), col("sum_value"))

  /** Sliding-window aggregate. */
  def slidingAgg(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDuration: String,
      slideDuration: String): DataFrame =
    events
      .groupBy(window(col(tsCol), windowDuration, slideDuration), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(keyCol),
        col("n_events"), col("sum_value"))

  /** Session-window aggregate (gap-based sessions). */
  def sessionAgg(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      gapDuration: String): DataFrame =
    events
      .groupBy(session_window(col(tsCol), gapDuration), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col(keyCol), col("n_events"), col("sum_value"))

  /** Open a file-based stream over a parquet directory with an explicit
    * schema and a watermark — the standard ingest shape. */
  def readParquetStream(
      spark: SparkSession,
      path: String,
      schema: StructType,
      tsCol: String,
      watermarkDelay: String): DataFrame =
    spark.readStream
      .schema(schema)
      .parquet(path)
      .withWatermark(tsCol, watermarkDelay)

  /** Run a streaming aggregate over a bounded file source to completion
    * into an in-memory table and return the result — used by tests to
    * prove the streaming path executes (batch equivalence proves the
    * semantics). */
  def runStreamToMemory(
      spark: SparkSession,
      streamed: DataFrame,
      queryName: String,
      outputMode: String = "complete"): DataFrame = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(queryName)
  }
}
