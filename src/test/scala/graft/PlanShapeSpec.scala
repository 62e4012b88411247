package graft

import org.apache.spark.sql.functions._

/** Plan-shape regression tests: the properties that matter at 100 TB
  * are visible in the optimized/executed plan — assert them so a
  * refactor cannot silently reintroduce a scale-killer.
  */
class PlanShapeSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = spark.range(200).toDF("doc_id")
    .withColumn("text",
      concat_ws(" ", lit("alpha beta gamma delta"), col("doc_id").cast("string")))

  test("MinHash LSH exchange carries only id/band/bucket — no text or shingle payload") {
    val plan = dedup.Dedup.minHashNearDuplicates(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    // every Exchange's output must not include the text or hash-set cols
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    val bandExchanges = exchanges.filter(_.contains("band"))
    assert(bandExchanges.nonEmpty, s"expected banded exchange in:\n$plan")
    bandExchanges.foreach { e =>
      assert(!e.contains("text") && !e.contains("hs#"),
        s"LSH exchange carries payload columns:\n$e")
    }
  }

  test("SimHash C(8,2) banding exchange carries only id/band/bucket — no text/fingerprint payload") {
    val plan = dedup.Dedup.simHashNearDuplicates(docs, "text", "doc_id", maxHamming = 6)
      .queryExecution.executedPlan.toString
    val bandExchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filter(_.contains("band")).toSeq
    assert(bandExchanges.nonEmpty, s"expected banded exchange in:\n$plan")
    bandExchanges.foreach { e =>
      assert(!e.contains("text") && !e.contains("toks#") && !e.contains("th#"),
        s"SimHash banding exchange carries payload columns:\n$e")
    }
  }

  test("simHash128 default-rung banding exchange carries only id/band/bucket") {
    val plan = dedup.Dedup.simHash128NearDuplicates(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    val bandExchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filter(_.contains("band")).toSeq
    assert(bandExchanges.nonEmpty, s"expected banded exchange in:\n$plan")
    bandExchanges.foreach { e =>
      assert(!e.contains("text") && !e.contains("toks#") && !e.contains("th#"),
        s"simHash128 banding exchange carries payload columns:\n$e")
    }
  }

  test("nearDedupStream plans ONE exchange on the shard key, no payload re-shuffle") {
    // the streaming near-dedup's only shuffle is the groupByKey on the
    // shard — a second exchange would mean the state pass re-partitions
    // payload, the classic accidental double-shuffle
    val dir = java.nio.file.Files.createTempDirectory("graft_neardedup_plan").toString
    Seq(streaming.Streaming.SimDoc("a", 1L, 0L, "p"),
      streaming.Streaming.SimDoc("b", 2L, 1L, "q")).toDS()
      .write.mode("overwrite").parquet(dir)
    val ds = spark.read.parquet(dir).as[streaming.Streaming.SimDoc]
    val plan = streaming.Streaming.nearDedupStream(ds, maxHamming = 3)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected exactly one exchange, got $exchanges in:\n$plan")
    assert(plan.contains("FlatMapGroupsWithState") || plan.contains("MapGroups"),
      s"expected the stateful map-groups operator in:\n$plan")
  }

  test("nearDedupStreamEventTime plans ONE exchange on the shard key, no payload re-shuffle") {
    // same single-exchange contract as the processing-time variant:
    // the only shuffle is the groupByKey on the shard
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft_evtime_plan").toString
    Seq(streaming.Streaming.TimedSimDoc("a", 1L, 0L, new Timestamp(0L), "p"),
      streaming.Streaming.TimedSimDoc("b", 2L, 1L, new Timestamp(1L), "q")).toDS()
      .write.mode("overwrite").parquet(dir)
    val ds = spark.read.parquet(dir).as[streaming.Streaming.TimedSimDoc]
    val plan = streaming.Streaming
      .nearDedupStreamEventTime(ds, maxHamming = 3, ttlMs = 60000L)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected exactly one exchange, got $exchanges in:\n$plan")
    assert(plan.contains("FlatMapGroupsWithState") || plan.contains("MapGroups"),
      s"expected the stateful map-groups operator in:\n$plan")
  }

  test("full-recall store probe broadcasts the micro-batch; the store never shuffles") {
    // dedupBatchAgainstStore's scale contract: the survivors store is
    // scanned map-side into a broadcast hash join on (band, bucket) —
    // the STORE side (the big side, survivors-so-far) must reach the
    // join with no exchange, and the within-batch banding must be
    // checkpoint-fenced out of this plan entirely, so NO banded
    // exchange may appear (a banded hashpartitioning here would mean
    // the store shuffles once per micro-batch — the accidental
    // quadratic a refactor could reintroduce)
    val root = java.nio.file.Files
      .createTempDirectory("graft_fullrecall_plan").toString
    val store = s"$root/store"
    val fps = spark.range(100).select(col("id"),
      (col("id") * 2654435761L).as("sim"))
    streaming.Streaming.appendBatchToFullRecallStore(
      fps.filter(col("id") < 50), store, 0L, maxHamming = 3)
    val out = streaming.Streaming.dedupBatchAgainstStore(
      fps.filter(col("id") >= 50), store, 1L, maxHamming = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"store probe must be a broadcast hash join:\n$plan")
    val bandedExchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filter(l => l.contains("band") || l.contains("bucket")).toSeq
    assert(bandedExchanges.isEmpty,
      s"store side must not shuffle on bands:\n${bandedExchanges.mkString("\n")}\nin:\n$plan")
    // over the broadcast guard, the probe must degrade to a
    // shuffle-hash join on (band, bucket) — both sides exchange once —
    // instead of force-broadcasting a backfill-sized banded batch
    val big = streaming.Streaming.dedupBatchAgainstStore(
      fps.filter(col("id") >= 50), store, 2L, maxHamming = 3,
      maxBroadcastBandedRows = 1L)
    val bigPlan = big.queryExecution.executedPlan.toString
    assert(bigPlan.contains("ShuffledHashJoin"),
      s"over-guard probe must plan a shuffle-hash join:\n$bigPlan")
  }

  test("saltedJoin short-circuit plans the plain broadcast join; engaged path salts the SMJ keys") {
    val left = spark.range(5000).toDF("k").withColumn("v", col("k") * 2)
    val dim = spark.range(50).toDF("k").withColumn("name", col("k").cast("string"))
    // broadcastable un-hinted right: physical plan must be the plain BHJ
    val sc = core.DataFrameOps.saltedJoin(left, dim, Seq("k"), saltFactor = 8)
    val scPlan = sc.queryExecution.executedPlan.toString
    assert(scPlan.contains("BroadcastHashJoin") && !scPlan.contains("__graft_salt"),
      s"short-circuit must plan the plain broadcast join:\n$scPlan")
    // merge-hinted right: SMJ joining on (key, salt)
    val en = core.DataFrameOps.saltedJoin(left, dim.hint("merge"), Seq("k"), saltFactor = 8)
    val enPlan = en.queryExecution.executedPlan.toString
    assert(enPlan.contains("SortMergeJoin") && enPlan.contains("__graft_salt"),
      s"engaged path must sort-merge on the salted key:\n$enPlan")
  }

  test("flagship entry query broadcasts all three dimension tables") {
    val plan = SparkEntry.entry(spark).queryExecution.executedPlan.toString
    val broadcasts = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts == 3, s"expected 3 broadcast joins:\n$plan")
  }

  test("exact dedup plans a single shuffle on the fingerprint") {
    val plan = dedup.Dedup.exactDedup(docs, "text", "doc_id")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Window"), s"expected window in:\n$plan")
  }

  test("readTable filter compiles to a data filter, not a post-scan-only filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_plan").toString
    docs.write.mode("overwrite").parquet(dir)
    val out = io.ReadTable.readParquet(spark, dir,
      columnFilters = Map("doc_id" -> Seq(1L, 2L)))
    val executed = out.queryExecution.executedPlan.toString
    assert(executed.contains("PushedFilters: [Or(EqualTo(doc_id,1),EqualTo(doc_id,2))]")
      || executed.contains("PushedFilters: [In(doc_id"),
      s"no pushed filter:\n$executed")
  }

  test("smartCoalesce adds no shuffle (Repartition with shuffle=false)") {
    val out = core.DataFrameOps.smartCoalesce(docs, targetFileSizeMb = 1)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"),
      s"coalesce should stay narrow:\n$plan")
  }

  test("batch stream-stream join bins to an equi-join — no product join") {
    import java.sql.Timestamp
    val l = Seq(("k", Timestamp.valueOf("2024-01-01 10:00:00"), 1))
      .toDF("key", "lts", "a")
    val r = Seq(("k", Timestamp.valueOf("2024-01-01 09:59:00"), 2))
      .toDF("key", "rts", "b")
    val plan = streaming.Streaming
      .streamStreamJoin(l, r, "key", "lts", "rts", lookbackSeconds = 3600)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"batch stream-join planned as a product:\n$plan")
    assert(plan.contains("__bin"), s"expected bin key in the join:\n$plan")
  }

  test("int8 quantization stays narrow — zero exchanges") {
    val vecs = spark.range(100).toDF("id")
      .withColumn("v", array(col("id").cast("double"), lit(1.0)))
    val plan = similarity.Quantize.quantizeInt8(vecs, "v")
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"),
      s"quantization must not shuffle:\n$plan")
  }

  test("PQ ADC scoring scans the corpus in place — broadcast query side, no corpus exchange before the partial top-k") {
    import spark.implicits._
    val rnd = new scala.util.Random(3L)
    val vecs = (0 until 64).map(i => (i.toLong, Array.fill(8)(rnd.nextGaussian())))
      .toDF("id", "vec")
    val cb = similarity.Pq.trainCodebooks(vecs, "id", "vec", m = 2, k = 8)
    val plan = similarity.Pq.adcTopK(
        similarity.Pq.encode(vecs, "id", "vec", cb),
        vecs.filter(col("id") < 2), "id", "vec", cb, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"query side must broadcast:\n$plan")
    // the only hash exchange is the post-partial-agg top-k reduce on
    // query_id — the corpus-side scan and scoring must not re-shuffle
    val hashExchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashExchanges.size == 1 && hashExchanges.head.contains("query_id"),
      s"expected exactly one hash exchange (top-k reduce on query_id):\n$plan")
    assert(plan.contains("partial_topk") || plan.contains("partial"),
      s"top-k must aggregate partially before the exchange:\n$plan")
  }

  test("deterministic sampling is a filter over the scan — no shuffle, no rand()") {
    val dir = java.nio.file.Files.createTempDirectory("graft_plan_samp").toString
    docs.write.mode("overwrite").parquet(dir)
    val out = core.Sampling.deterministicSample(
      spark.read.parquet(dir), "doc_id", 0.25, "x")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"), s"sampling shuffled:\n$plan")
    assert(!plan.contains("rand("), s"sampling must be RNG-free:\n$plan")
  }

  test("bloom semi join probes at the scan: candidate filter BEFORE the only left exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_plan_bloom").toString
    spark.range(2000).toDF("k").write.mode("overwrite").parquet(s"$dir/left")
    spark.range(0, 2000, 40).toDF("rk").write.mode("overwrite").parquet(s"$dir/right")
    val left = spark.read.parquet(s"$dir/left")
    val right = spark.read.parquet(s"$dir/right")
    // pin the bloom path: this fixture's right side is below the
    // adaptive crossover, and this test asserts the bloom plan shape
    spark.conf.set(core.DataFrameOps.BloomSmallRightRowsConf, "0")
    try {
      val out = core.DataFrameOps.bloomSemiJoin(left, right, "k", "rk")
      // force a shuffled join so the probe-vs-exchange ordering is visible
      val plan = out.hint("shuffle_hash")
        .queryExecution.executedPlan.toString
      assert(plan.contains("bloom_might_contain"),
        s"probe expression missing from the plan:\n$plan")
      // the probe must sit under a Filter on the scan side, not above a join
      val probeLine = plan.linesIterator.indexWhere(l =>
        l.contains("Filter") && l.contains("bloom_might_contain"))
      assert(probeLine >= 0, s"probe is not a scan-side Filter:\n$plan")
    } finally spark.conf.unset(core.DataFrameOps.BloomSmallRightRowsConf)
  }

  test("bloom joins route small right sides to the plain broadcast join (no bloom build)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_plan_bloom2").toString
    spark.range(2000).toDF("k").write.mode("overwrite").parquet(s"$dir/left")
    spark.range(0, 2000, 40).toDF("rk").write.mode("overwrite").parquet(s"$dir/right")
    val left = spark.read.parquet(s"$dir/left")
    val right = spark.read.parquet(s"$dir/right")
    val semi = core.DataFrameOps.bloomSemiJoin(left, right, "k", "rk")
    val anti = core.DataFrameOps.bloomAntiJoin(left, right, "k", "rk")
    for ((out, name) <- Seq((semi, "semi"), (anti, "anti"))) {
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("bloom_might_contain"),
        s"$name: small-right regime must skip the bloom:\n$plan")
      assert(plan.contains("BroadcastHashJoin"),
        s"$name: small-right regime must broadcast the exact join:\n$plan")
    }
  }

  test("stateless streaming decontamination plans zero exchanges and zero state ops") {
    import spark.implicits._
    val evalDf = Seq((1L, "aa bb cc dd ee")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_plan_decon").toString
    Seq((2L, "xx yy zz")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val out = streaming.Streaming.decontaminateStream(
      spark.read.parquet(dir), evalDf, "text", n = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"),
      s"stateless decon filter must not shuffle:\n$plan")
    assert(plan.contains("bloom_any_contain") && plan.contains("sorted_set_count"),
      s"both probe kernels must appear in the one filter:\n$plan")
  }
}
