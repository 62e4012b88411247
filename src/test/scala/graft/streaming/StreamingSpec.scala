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

  test("decontaminateStream equals batch decontaminate across micro-batches") {
    import graft.dedup.Dedup
    val mk = (id: Long, t: String) => (id, t)
    val evalDf = Seq(
      mk(900L, "held out benchmark alpha beta gamma delta epsilon"),
      mk(901L, "another eval passage one two three four five")).toDF("doc_id", "text")
    val batch1 = Seq(
      mk(1L, "clean doc aa bb cc dd ee ff gg"),
      mk(2L, "poisoned text held out benchmark alpha beta gamma delta epsilon tail"))
    val batch2 = Seq(
      mk(3L, "another clean one hh ii jj kk ll mm"),
      mk(4L, "also poisoned one two three four five suffix words here"))
    val dir = java.nio.file.Files.createTempDirectory("graft_decon_stream").toString
    batch1.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/in")
    Thread.sleep(20)
    batch2.toDF("doc_id", "text").write.mode("append").parquet(s"$dir/in")
    val streamed = spark.readStream
      .schema(batch1.toDF("doc_id", "text").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
    val got = Streaming.runStreamToMemory(spark,
        Streaming.decontaminateStream(streamed, evalDf, "text", n = 5),
        "graft_decon_stream_sink", outputMode = "append")
      .select("doc_id").as[Long].collect().toSet
    val want = Dedup.decontaminate(
        (batch1 ++ batch2).toDF("doc_id", "text"), evalDf, "text", "doc_id", n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(got == want)
    assert(got == Set(1L, 3L), "poisoned docs must be filtered out of the stream")
  }

  test("decontaminateStream minHits thresholds on EXACT gram counts, not bloom hits") {
    // doc 11 shares exactly ONE 3-gram with eval; doc 12 shares two
    val evalDf = Seq((900L, "xx yy zz qq ww ee")).toDF("doc_id", "text")
    val docs = Seq(
      (11L, "xx yy zz aa bb cc dd"),
      (12L, "xx yy zz qq rr yy zz qq ww uu"),
      (13L, "totally unrelated words pp oo nn")).toDF("doc_id", "text")
    // minHits=2: only the two-gram overlap goes
    val keep2 = Streaming.decontaminateStream(docs, evalDf, "text", n = 3, minHits = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(keep2 == Set(11L, 13L))
    // minHits=1: both overlapping docs go
    val keep1 = Streaming.decontaminateStream(docs, evalDf, "text", n = 3, minHits = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(keep1 == Set(13L))
  }

  test("decontaminateStream refuses an eval corpus over the driver bound") {
    val evalDf = Seq((1L, "a b c d e f g h i j k l m n o p")).toDF("doc_id", "text")
    val docs = Seq((2L, "x y z")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      Streaming.decontaminateStream(docs, evalDf, "text", n = 3, maxDriverGrams = 2))
    assert(e.getMessage.contains("maxDriverGrams"))
  }

  test("windowedDistinctCounts: small windows exact, stream agrees with batch contract") {
    // 3 distinct users for key a in the 10:00 window (u1 twice), 1 in 11:00
    val ev = Seq(
      (ts("2024-01-01 10:05:00"), "a", "u1"),
      (ts("2024-01-01 10:15:00"), "a", "u1"),
      (ts("2024-01-01 10:25:00"), "a", "u2"),
      (ts("2024-01-01 10:50:00"), "a", "u3"),
      (ts("2024-01-01 11:10:00"), "a", "u9"),
      (ts("2024-01-01 10:20:00"), "b", "u1")
    ).toDF("ts", "key", "uid")
    val out = Streaming.windowedDistinctCounts(ev, "ts", "key", "uid", "1 hour")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(2)) -> r.getLong(3)).toMap
    // at these cardinalities the sketch is in sparse mode: exact
    assert(out == Map(
      ("2024-01-01 10:00:00.0", "a") -> 3L,
      ("2024-01-01 11:00:00.0", "a") -> 1L,
      ("2024-01-01 10:00:00.0", "b") -> 1L))

    // same plan behind a watermark on a real stream: window set matches
    // the batch run and every estimate stays within HLL error of exact
    val dir = java.nio.file.Files.createTempDirectory("graft_wdc").toString
    ev.write.mode("overwrite").parquet(dir)
    val streamed = Streaming.readParquetStream(spark, dir, ev.schema, "ts", "10 minutes")
    val streamRes = Streaming.runStreamToMemory(spark,
      Streaming.windowedDistinctCounts(streamed, "ts", "key", "uid", "1 hour"),
      "graft_wdc_test")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(2)) -> r.getLong(3)).toMap
    assert(streamRes.keySet == out.keySet)
    streamRes.foreach { case (k, est) =>
      val exact = out(k)
      assert(math.abs(est - exact) <= math.max(1L, math.ceil(exact * 0.1).toLong),
        s"window $k estimate $est vs exact $exact")
    }
    intercept[IllegalArgumentException](
      Streaming.windowedDistinctCounts(ev, "ts", "key", "uid", "1 hour", lgK = 2))
  }

  test("curationGateStream equals the batch predicate across micro-batches") {
    val batch1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"), // varied vocab
      (2L, "spam spam spam spam spam spam spam spam"))           // entropy 0
    val batch2 = Seq(
      (3L, "merge sort scan filter join group window order limit"),
      (4L, "aa aa aa aa aa aa"))                                  // entropy 0
    val all = (batch1 ++ batch2).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_gate_stream").toString
    batch1.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(s"$dir/in")
    Thread.sleep(1000)
    batch2.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(s"$dir/in")
    val streamed = spark.readStream
      .schema(all.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
    val gotEntropyOnly = Streaming.runStreamToMemory(spark,
        Streaming.curationGateStream(streamed, "text", minTokenEntropy = 1.0),
        "graft_gate_stream_sink", outputMode = "append")
      .select("doc_id").as[Long].collect().toSet
    val wantBatch = all.filter(
        round(graft.text.TextFunctions.tokenEntropy($"text"), 6) >= 1.0)
      .select("doc_id").as[Long].collect().toSet
    assert(gotEntropyOnly == wantBatch)
    assert(gotEntropyOnly == Set(1L, 3L))
    // full gate: deflate ceiling + DSIR floor under batch-trained
    // ratios; the stream result equals the batch predicate exactly
    val target = all.filter($"doc_id".isin(1L, 3L))
    val ratios = graft.core.Dsir.trainHashedRatios(
      all, target, "text", numBuckets = 1 << 16)
    val weights = graft.core.Dsir.importanceWeightsHashed(
        all, target, "text", numBuckets = 1 << 16)
      .select("doc_id", "log_weight").as[(Long, Double)].collect().toMap
    val minW = (weights(1L) + weights(2L)) / 2 // between target-like and spam
    val streamed2 = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    // short fixture texts deflate ABOVE 1.0 (header overhead dominates
    // tiny inputs), so the ceiling here only excludes pathological
    // expansion; the DSIR floor does the separating
    val gotFull = Streaming.runStreamToMemory(spark,
        Streaming.curationGateStream(streamed2, "text",
          minTokenEntropy = 0.0, maxDeflateRatio = 1.5,
          dsirRatios = Some((ratios, minW))),
        "graft_gate_stream_sink2", outputMode = "append")
      .select("doc_id").as[Long].collect().toSet
    val batchKept = all.filter(
        graft.text.TextFunctions.deflateRatio($"text") <= 1.5)
      .select("doc_id").as[Long].collect().toSet
      .filter(id => weights(id) >= minW)
    assert(gotFull == batchKept)
    assert(gotFull.contains(1L) && !gotFull.contains(2L),
      "DSIR floor must separate target-like from spam")
  }
}
