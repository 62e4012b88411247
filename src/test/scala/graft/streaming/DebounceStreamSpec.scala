package graft.streaming

import graft.SparkTestBase
import graft.streaming.Streaming.{TimedEvent, debounceStream}

class DebounceStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("debounceStream keeps burst openers (batch mode) and matches sessionLeaders") {
    val evs = Seq(
      TimedEvent("a", 0L, 1L, "p"), TimedEvent("a", 10L, 2L, "p"),
      TimedEvent("a", 100L, 3L, "p"), TimedEvent("a", 105L, 4L, "p"),
      TimedEvent("b", 3L, 5L, "p"))
    val out = debounceStream(evs.toDS(), gapSec = 30L)
      .collect().map(_.id).toSet
    assert(out == Set(1L, 3L, 5L))
    // cross-check against the batch operator on the same data
    val df = evs.toDF().select($"key", $"id",
      org.apache.spark.sql.functions.timestamp_seconds($"epochSec").as("t"))
    val leaders = graft.operators.TimeSeries
      .sessionLeaders(df, "key", "t", gapSec = 30L, orderCols = Seq("t", "id"))
      .select("id").as[Long].collect().toSet
    assert(leaders == out)
  }

  test("debounceStream remembers lastSeen across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_debounce").toString
    // batch 1 ends at t=50; batch 2 starts at t=60 (gap 10 <= 30: suppressed)
    // ONE file per write: a 2-row local Dataset writes one part file
    // PER PARTITION with near-identical mtimes, and FileStreamSource
    // breaks mtime ties by the random UUID part name — the two rows of
    // a batch could then split across micro-batches in either order
    // (the in-suite flake this spec had twice). coalesce(1) plus the
    // 1 s mtime gap pins file order = batch order.
    Seq(TimedEvent("k", 0L, 1L, "p"), TimedEvent("k", 50L, 2L, "p")).toDS()
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/in")
    Thread.sleep(1000)
    Seq(TimedEvent("k", 60L, 3L, "p"), TimedEvent("k", 200L, 4L, "p")).toDS()
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val streamed = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[TimedEvent]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in").as[TimedEvent]
    val ids = Streaming.runStreamToMemory(spark,
        debounceStream(streamed, gapSec = 30L).toDF(), "graft_debounce_stream",
        outputMode = "append")
      .select("id").as[Long].collect().toSet
    // 1 opens; 2 opens (gap 50 > 30); 3 suppressed ACROSS the batch
    // boundary (gap 10 — the state carry being tested); 4 opens (gap 140)
    assert(ids == Set(1L, 2L, 4L))
  }
}
