package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DriftStreamSpec extends SparkTestBase {
  import spark.implicits._

  // ref: steady 50/50 a/b; cur: window 0 matches, window 1 skews hard
  private def refDf = (Seq.fill(50)("a") ++ Seq.fill(50)("b")).toDF("k")

  private def events = Seq(
    // window [0, 3600): 2 a, 2 b — like ref
    (100L, "a"), (200L, "b"), (300L, "a"), (400L, "b"),
    // window [3600, 7200): 4 a, 0 b — drifted
    (3700L, "a"), (3800L, "a"), (3900L, "a"), (4000L, "a"))
    .toDF("epoch", "event_type")
    .select(timestamp_seconds(col("epoch")).as("ts"), col("event_type"))

  test("two-stage drift monitor: matching window ~0 PSI, drifted window high") {
    val counts = Streaming.windowedCategoryCounts(events, "ts", "event_type", "1 hour")
    val refP = graft.core.Drift.referenceProportions(refDf, "k")
    val out = graft.core.Drift.driftPerWindow(counts, refP).collect()
      .map(r => r.getAs[java.sql.Timestamp]("window_start").getTime / 1000 ->
        (r.getAs[Double]("psi"), r.getAs[Long]("n_events"))).toMap
    assert(out.keySet == Set(0L, 3600L))
    assert(math.abs(out(0L)._1) < 0.01, s"matching window PSI: ${out(0L)._1}")
    assert(out(3600L)._1 > 0.25, s"drifted window PSI: ${out(3600L)._1}")
    assert(out(0L)._2 == 4L && out(3600L)._2 == 4L)
  }

  test("stage 1 runs as a real watermarked stream, batch ≡ stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft_drift_stream").toString
    events.write.mode("overwrite").parquet(s"$dir/in")
    val streamed = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
      .withWatermark("ts", "10 minutes")
    val streamCounts = Streaming.runStreamToMemory(spark,
      Streaming.windowedCategoryCounts(streamed, "ts", "event_type", "1 hour"),
      "graft_drift_counts", outputMode = "complete")
    val batchCounts = Streaming.windowedCategoryCounts(events, "ts", "event_type", "1 hour")
    val s = streamCounts.collect()
      .map(r => (r.getAs[java.sql.Timestamp](0).getTime, r.getString(1), r.getLong(2))).toSet
    val b = batchCounts.collect()
      .map(r => (r.getAs[java.sql.Timestamp](0).getTime, r.getString(1), r.getLong(2))).toSet
    assert(s == b && s.nonEmpty)
    // the finisher composes on the streamed counts identically
    val refP = graft.core.Drift.referenceProportions(refDf, "k")
    val psi = graft.core.Drift.driftPerWindow(streamCounts, refP)
      .collect().map(r => r.getAs[Double]("psi"))
    assert(psi.length == 2)
  }

  test("categories outside the reference taxonomy are ignored, in-ref still scored") {
    val cur = Seq((100L, "a"), (200L, "zz")).toDF("epoch", "event_type")
      .select(timestamp_seconds(col("epoch")).as("ts"), col("event_type"))
    val counts = Streaming.windowedCategoryCounts(cur, "ts", "event_type", "1 hour")
    val refP = graft.core.Drift.referenceProportions(refDf, "k")
    val row = graft.core.Drift.driftPerWindow(counts, refP).collect()(0)
    // only the in-ref event is counted
    assert(row.getAs[Long]("n_events") == 1L)
    assert(!row.getAs[Double]("psi").isNaN)
  }
}
