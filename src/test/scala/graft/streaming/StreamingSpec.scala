package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events = Seq(
    (ts("2024-01-01 10:05:00"), "a", 1.0),
    (ts("2024-01-01 10:50:00"), "a", 2.0),
    (ts("2024-01-01 11:10:00"), "a", 4.0),
    (ts("2024-01-01 10:20:00"), "b", 8.0)
  ).toDF("ts", "key", "value")

  test("tumblingAgg groups into fixed windows") {
    val out = Streaming.tumblingAgg(events, "ts", "key", "1 hour")
    val got = out.collect().map(r =>
      (r.getTimestamp(0).toString, r.getString(2), r.getLong(3), r.getDouble(4))).toSet
    assert(got == Set(
      ("2024-01-01 10:00:00.0", "a", 2L, 3.0),
      ("2024-01-01 11:00:00.0", "a", 1L, 4.0),
      ("2024-01-01 10:00:00.0", "b", 1L, 8.0)))
  }

  test("slidingAgg assigns events to window/slide many windows") {
    val out = Streaming.slidingAgg(events, "ts", "key", "1 hour", "30 minutes")
    // each event falls in exactly 2 windows
    assert(out.agg(sum("n_events")).head().getLong(0) == events.count() * 2)
  }

  test("sessionAgg merges events within gap, splits beyond it") {
    val out = Streaming.sessionAgg(events, "ts", "key", "50 minutes")
    val a = out.filter($"key" === "a").collect()
      .map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString,
        r.getLong(3), r.getDouble(4))).toSet
    // 10:05 & 10:50 within 50min gap; 11:10 within 50min of 10:50 → one
    // session; session end = last event (11:10) + 50min gap = 12:00
    assert(a == Set(("2024-01-01 10:05:00.0", "2024-01-01 12:00:00.0", 3L, 7.0)))
    // NB session windows merge at diff == gap (inclusive), so a 20-minute
    // gap would still merge the 10:50→11:10 pair; 15 minutes splits it
    val short = Streaming.sessionAgg(events, "ts", "key", "15 minutes")
    assert(short.filter($"key" === "a").count() == 3)
  }

  test("streaming path executes: batch and stream results agree") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    events.write.mode("overwrite").parquet(dir)
    val schema = events.schema
    val streamed = Streaming.readParquetStream(spark, dir, schema, "ts", "10 minutes")
    val agg = Streaming.tumblingAgg(streamed, "ts", "key", "1 hour")
    val result = Streaming.runStreamToMemory(spark, agg, "graft_stream_test")
    val batch = Streaming.tumblingAgg(events, "ts", "key", "1 hour")
    assertDfEqual(
      result.orderBy("window_start", "key"),
      batch.orderBy("window_start", "key"))
  }
}
