package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class HeavyHittersStreamSpec extends SparkTestBase {
  import spark.implicits._

  // window [0, 3600): "x" 6 times, singles y1..y4 → x is the only heavy
  // window [3600, 7200): "z" 5 of 6 → z heavy
  private def events = (
    Seq.fill(6)("x").zipWithIndex.map { case (i, j) => (100L + j, i) } ++
      Seq("y1", "y2", "y3", "y4").zipWithIndex.map { case (i, j) => (500L + j, i) } ++
      Seq.fill(5)("z").zipWithIndex.map { case (i, j) => (3700L + j, i) } ++
      Seq((3900L, "w")))
    .toDF("epoch", "item")
    .select(timestamp_seconds(col("epoch")).as("ts"), col("item"))

  test("windowedHeavyHitters surfaces per-window trending items") {
    val out = Streaming.windowedHeavyHitters(events, "ts", "item", "1 hour", k = 3)
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp](0).getTime / 1000,
        r.getString(1)) -> r.getLong(2)).toMap
    // MG estimates are lower bounds; the dominant item per window leads
    assert(out((0L, "x")) >= 3L, s"x underestimated: $out")
    assert(out((3600L, "z")) >= 4L)
    assert(!out.keySet.map(_._2).contains("(null)"))
  }

  test("per-window contract check: heavy captured, zero violations") {
    val out = Streaming
      .windowedHeavyHittersCheck(events, "ts", "item", "1 hour", k = 3)
      .collect()
      .map(r => r.getAs[java.sql.Timestamp](0).getTime / 1000 ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // w0: n=10, bound=2.5 → heavy = {x}; w1: n=6, bound=1.5 → {z}
    assert(out(0L) == ((10L, 1L, 0L, 0L, 0L)))
    assert(out(3600L) == ((6L, 1L, 0L, 0L, 0L)))
  }

  test("runs as a real watermarked stream, batch ≡ stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hh_stream").toString
    // one file per window: MG estimates are merge-order-dependent, so
    // multi-file batches with tied mtimes (random UUID tie-break in
    // FileStreamSource) could replay in an order batch mode never sees;
    // window-aligned files keep the stream's per-window item order =
    // batch order while still exercising two real micro-batches
    events.filter(col("ts") < timestamp_seconds(lit(3600)))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/in")
    Thread.sleep(1000)
    events.filter(col("ts") >= timestamp_seconds(lit(3600)))
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val streamed = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
      .withWatermark("ts", "10 minutes")
    val streamHH = Streaming.runStreamToMemory(spark,
      Streaming.windowedHeavyHitters(streamed, "ts", "item", "1 hour", k = 3),
      "graft_hh_counts", outputMode = "complete")
    // MG estimates are merge-order-dependent, and streaming merges in
    // arrival order while batch merges in partial-agg order — so the
    // pin is the CONTRACT, not bit-equality: same windows, every heavy
    // item present with its estimate inside [true − n/(k+1), true]
    val rows = streamHH.collect()
      .map(r => (r.getAs[java.sql.Timestamp](0).getTime / 1000,
        r.getString(1), r.getLong(2)))
    assert(rows.map(_._1).toSet == Set(0L, 3600L))
    val w0 = rows.filter(_._1 == 0L).map(t => t._2 -> t._3).toMap
    val w1 = rows.filter(_._1 == 3600L).map(t => t._2 -> t._3).toMap
    // w0: n=10, bound=2.5, true x=6; w1: n=6, bound=1.5, true z=5
    assert(w0.contains("x") && w0("x") >= 6L - 2.5 && w0("x") <= 6L,
      s"w0 heavy item broke the contract: $w0")
    assert(w1.contains("z") && w1("z") >= 5L - 1.5 && w1("z") <= 5L,
      s"w1 heavy item broke the contract: $w1")
    assert(rows.count(_._1 == 0L) <= 3 && rows.count(_._1 == 3600L) <= 3,
      "summaries must stay within k entries")
  }
}
