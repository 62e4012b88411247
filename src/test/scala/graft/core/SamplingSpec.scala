package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def rows = spark.range(0, 2000).toDF("id")

  test("deterministicSample is reproducible and near the target rate") {
    val a = Sampling.deterministicSample(rows, "id", 0.25, "s1")
    val b = Sampling.deterministicSample(rows, "id", 0.25, "s1")
    assert(a.select("id").as[Long].collect().toSet ==
      b.select("id").as[Long].collect().toSet)
    val n = a.count()
    assert(n > 2000 * 0.25 * 0.7 && n < 2000 * 0.25 * 1.3,
      s"sample size $n far from expected 500")
  }

  test("deterministicSample is stable under repartitioning") {
    val base = Sampling.deterministicSample(rows, "id", 0.2, "x")
      .select("id").as[Long].collect().toSet
    val shuffled = Sampling.deterministicSample(rows.repartition(7), "id", 0.2, "x")
      .select("id").as[Long].collect().toSet
    assert(base == shuffled)
  }

  test("different salts draw (mostly) independent samples") {
    val a = Sampling.deterministicSample(rows, "id", 0.5, "a")
      .select("id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(rows, "id", 0.5, "b")
      .select("id").as[Long].collect().toSet
    val overlap = a.intersect(b).size.toDouble / math.max(a.size, 1)
    assert(overlap > 0.3 && overlap < 0.7, s"overlap $overlap not ~0.5")
  }

  test("fraction bounds: 0 keeps nothing, 1 keeps everything") {
    assert(Sampling.deterministicSample(rows, "id", 0.0).count() == 0)
    assert(Sampling.deterministicSample(rows, "id", 1.0).count() == 2000)
    assertThrows[IllegalArgumentException](
      Sampling.deterministicSample(rows, "id", 1.5))
  }

  test("mixCorpora tags each source and samples at its fraction") {
    val a = spark.range(0, 1000).toDF("id")
    val b = spark.range(1000, 2000).toDF("id")
    val mixed = Sampling.mixCorpora(Seq(("web", a, 1.0), ("code", b, 0.0)), "id")
    assert(mixed.columns.contains("source"))
    assert(mixed.count() == 1000)
    assert(mixed.select("source").distinct().as[String].collect().toSeq == Seq("web"))
  }

  test("stratifiedSample respects per-stratum fractions") {
    val d = Seq.tabulate(400)(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "s")
    val out = Sampling.stratifiedSample(d, "s", Map[Any, Double]("a" -> 1.0, "b" -> 0.0))
    assert(out.filter($"s" === "b").count() == 0)
    assert(out.filter($"s" === "a").count() == 200)
  }

  private def strata = Seq.tabulate(3000)(i =>
    (i.toLong, if (i % 10 < 8) "big" else if (i % 10 == 8) "mid" else "small"))
    .toDF("id", "s")

  test("deterministicStratifiedSample: exact endpoints, default drop, stability") {
    val out = Sampling.deterministicStratifiedSample(
      strata, "s", Map("big" -> 0.25, "mid" -> 1.0), "id", "t")
    assert(out.filter($"s" === "small").count() == 0, "unlisted stratum must drop")
    assert(out.filter($"s" === "mid").count() == 300, "fraction 1.0 keeps all")
    val nBig = out.filter($"s" === "big").count()
    assert(nBig > 2400 * 0.25 * 0.7 && nBig < 2400 * 0.25 * 1.3, s"big stratum $nBig")
    val again = Sampling.deterministicStratifiedSample(
      strata.repartition(5), "s", Map("big" -> 0.25, "mid" -> 1.0), "id", "t")
    assert(out.select("id").as[Long].collect().toSet ==
      again.select("id").as[Long].collect().toSet, "must be partitioning-stable")
  }

  test("temperatureMix: alpha=1 reproduces proportional rates; alpha<1 flattens") {
    // alpha=1: rate_s = target/N for every stratum — uniform thinning
    val prop = Sampling.temperatureMix(strata, "s", "id", alpha = 1.0,
      targetRows = 600, salt = "a1")
    val total = prop.count()
    assert(total > 600 * 0.7 && total < 600 * 1.3, s"alpha=1 total $total !~ 600")
    // alpha=0.5: the small stratum's share must EXCEED its raw share
    val flat = Sampling.temperatureMix(strata, "s", "id", alpha = 0.5,
      targetRows = 600, salt = "a2")
    val smallShareFlat = flat.filter($"s" === "small").count().toDouble /
      math.max(flat.count(), 1)
    // raw share is 10%; sqrt-flattening lifts it to ~20.7% expected
    assert(smallShareFlat > 0.15,
      s"alpha=0.5 small-stratum share $smallShareFlat should beat raw 10%")
    // deterministic: same args → same rows
    val again = Sampling.temperatureMix(strata.repartition(7), "s", "id", 0.5, 600, "a2")
    assert(flat.select("id").as[Long].collect().toSet ==
      again.select("id").as[Long].collect().toSet)
  }

  test("temperatureMix caps rates at 1 instead of upsampling") {
    // tiny stratum + huge target → its rate caps at 1.0 and it survives whole
    val out = Sampling.temperatureMix(strata, "s", "id", 0.5, targetRows = 100000)
    assert(out.filter($"s" === "small").count() == 300)
    assert(out.count() == 3000)
  }

  test("packShards: budget rule, per-group reset, overflow bounded by one row") {
    val d = Seq(
      ("a", 1L, 30.0), ("a", 2L, 30.0), ("a", 3L, 50.0), ("a", 4L, 10.0),
      ("b", 1L, 200.0), ("b", 2L, 5.0)).toDF("g", "id", "w")
    val out = Sampling.packShards(d, "w", budget = 60.0, Seq("g"), "id")
      .select("g", "id", "shard_id").as[(String, Long, Long)].collect().toSet
    // group a exclusive cumsums: 0,30,60,110 → shards 0,0,1,1
    // group b: 0,200 → shards 0,3 (a 200-weight row overflows alone)
    assert(out == Set(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 1L), ("a", 4L, 1L),
      ("b", 1L, 0L), ("b", 2L, 3L)))
  }

  test("deterministicSplit: covering, proportional, partitioning-stable") {
    val d = spark.range(0, 4000).toDF("id")
    val out = Sampling.deterministicSplit(
      d, "id", Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), "s1")
    assert(out.count() == 4000, "every row must get a label")
    val byLabel = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel("train") > 4000 * 0.8 * 0.9 && byLabel("train") < 4000 * 0.8 * 1.1)
    assert(byLabel("val") > 4000 * 0.1 * 0.6 && byLabel("val") < 4000 * 0.1 * 1.4)
    val again = Sampling.deterministicSplit(
        d.repartition(7), "id", Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), "s1")
      .filter($"split" === "val").select("id").as[Long].collect().toSet
    assert(again == out.filter($"split" === "val").select("id").as[Long].collect().toSet)
    assertThrows[IllegalArgumentException](
      Sampling.deterministicSplit(d, "id", Seq(("a", 0.5), ("b", 0.4))))
  }

  test("quotaSample: exactly n per stratum, small strata whole, deterministic") {
    val d = Seq.tabulate(500)(i => (i.toLong, if (i < 480) "big" else "tiny"))
      .toDF("id", "s")
    val out = Sampling.quotaSample(d, "s", n = 50, "id", salt = "z")
    assert(out.filter($"s" === "big").count() == 50)
    assert(out.filter($"s" === "tiny").count() == 20, "undersized stratum keeps all")
    val again = Sampling.quotaSample(d.repartition(9), "s", 50, "id", "z")
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
    // a different salt draws a (mostly) different quota from the big stratum
    val other = Sampling.quotaSample(d, "s", 50, "id", "w")
      .filter($"s" === "big").select("id").as[Long].collect().toSet
    val overlap = other.intersect(
      out.filter($"s" === "big").select("id").as[Long].collect().toSet).size
    assert(overlap < 30, s"salts should draw mostly independent quotas, overlap=$overlap")
  }

  test("quotaSample equals the naive rank window (local prune is a pure optimisation)") {
    import org.apache.spark.sql.expressions.Window
    val d = Seq.tabulate(800)(i => (i.toLong, "s" + (i % 7), "p" + i)).toDF("id", "s", "payload")
    val naive = d.withColumn("rn", row_number().over(
        Window.partitionBy($"s").orderBy(
          md5(concat(lit("eq"), $"s", $"id".cast("string"))), $"id")))
      .filter($"rn" <= 13).drop("rn")
      .select("id").as[Long].collect().toSet
    val scalable = Sampling.quotaSample(d.repartition(6), "s", 13, "id", "eq")
      .select("id").as[Long].collect().toSet
    assert(scalable == naive)
  }

  test("assembleShards: ordered concat per shard, counts and weights") {
    val d = Seq(
      ("a", 3L, "c3", 10.0), ("a", 1L, "c1", 10.0), ("a", 2L, "c2", 10.0),
      ("b", 1L, "x", 5.0)).toDF("g", "id", "text", "w")
      .withColumn("shard_id", lit(0L))
    val out = Sampling.assembleShards(d, "text", "w", Seq("g"), "id")
      .select("g", "shard_id", "packed_text", "n_docs", "total_weight")
      .as[(String, Long, String, Long, Double)].collect().toSet
    assert(out == Set(
      ("a", 0L, "c1\n\nc2\n\nc3", 3L, 30.0),
      ("b", 0L, "x", 1L, 5.0)))
  }

  test("packShardsGreedy: exact greedy semantics, no overflow, per-group reset") {
    val d = Seq(
      ("a", 1L, 30.0), ("a", 2L, 30.0), ("a", 3L, 50.0), ("a", 4L, 10.0),
      ("b", 1L, 200.0), ("b", 2L, 5.0)).toDF("g", "id", "w")
    val out = Sampling.packShardsGreedy(d, "w", budget = 60.0, Seq("g"), "id")
      .select("g", "id", "shard_id").as[(String, Long, Long)].collect().toSet
    // a: 30 | +30=60 stays | +50 would be 110 → new shard 50 | +10=60 stays
    // b: 200 alone (over budget) | +5 would be 205 → new shard
    assert(out == Set(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 1L), ("a", 4L, 1L),
      ("b", 1L, 0L), ("b", 2L, 1L)))
  }

  test("packShardsGreedy: no multi-row shard exceeds the budget; ids consecutive") {
    val d = Seq.tabulate(600)(i => ("g" + (i % 3), i.toLong, 7.0 + i % 5))
      .toDF("g", "id", "w")
    val packed = Sampling.packShardsGreedy(d, "w", 50.0, Seq("g"), "id")
    val shards = packed.groupBy("g", "shard_id")
      .agg(sum($"w").as("tot"), count(lit(1)).as("n"))
    assert(shards.filter($"tot" > 50.0 && $"n" > 1).count() == 0,
      "greedy packing must never overflow a multi-row shard")
    // consecutive shard ids 0..max per group (greedy never skips)
    val perGroup = shards.groupBy("g")
      .agg(max($"shard_id").as("mx"), count(lit(1)).as("n"))
    assert(perGroup.filter($"mx" =!= $"n" - 1).count() == 0)
    // stable under input repartitioning
    val again = Sampling.packShardsGreedy(d.repartition(11), "w", 50.0, Seq("g"), "id")
      .select("g", "id", "shard_id").as[(String, Long, Long)].collect().toSet
    assert(again == packed.select("g", "id", "shard_id")
      .as[(String, Long, Long)].collect().toSet)
  }

  test("packShards: every shard except a group's last reaches the budget") {
    val d = Seq.tabulate(500)(i => ("g" + (i % 4), i.toLong, 7.0 + i % 5))
      .toDF("g", "id", "w")
    val shards = Sampling.packShards(d, "w", 50.0, Seq("g"), "id")
      .groupBy("g", "shard_id").agg(sum($"w").as("tot"))
    val maxShard = shards.groupBy("g").agg(max($"shard_id").as("last"))
    val nonLast = shards.join(maxShard, Seq("g")).filter($"shard_id" < $"last")
    // cumulative chunking: a non-final shard's total is within one max
    // row weight (11 here) of the budget on either side — the boundary
    // row that crosses the cut belongs to the NEXT shard
    assert(nonLast.filter($"tot" <= 50.0 - 11.0).count() == 0)
    assert(nonLast.filter($"tot" >= 50.0 + 11.0).count() == 0)
  }

  test("weightedSample: deterministic, partitioning-invariant, weight-sensitive") {
    val df = (1L to 300L).map(i => (i, if (i == 7L) 1000.0 else 1.0))
      .toDF("id", "w")
    val s1 = Sampling.weightedSample(df, "w", 20, "id")
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.weightedSample(df.repartition(13), "w", 20, "id")
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "same sample regardless of partitioning")
    assert(s1.size == 20)
    // the 1000x-weighted row wins a slot under (almost) any salt
    val hits = (1 to 10).count(s => Sampling.weightedSample(df, "w", 20, "id",
      salt = s.toString).collect().map(_.getLong(0)).contains(7L))
    assert(hits >= 9, s"w=1000 row sampled only $hits/10 times")
  }

  test("weightedSample: non-positive and null weights excluded; n > rows keeps all") {
    val df = Seq((1L, Some(2.0)), (2L, Some(-1.0)), (3L, None), (4L, Some(0.5)))
      .toDF("id", "w")
    val out = Sampling.weightedSample(df, "w", 10, "id")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 4L))
  }

  test("weightedSamplePerGroup: per-stratum quotas, deterministic, weight-aware") {
    val df = ((1L to 200L).map(i => ("s1", i, if (i == 7L) 500.0 else 1.0)) ++
      (201L to 260L).map(i => ("s2", i, 1.0)) ++
      Seq(("s3", 300L, 1.0)))
      .toDF("g", "id", "w")
    val out = Sampling.weightedSamplePerGroup(df, "g", "w", 10, "id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byG = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byG("s1").size == 10 && byG("s2").size == 10)
    assert(byG("s3") == Set(300L), "short stratum keeps all rows")
    assert(byG("s1").contains(7L), "500x weight must win a slot")
    val again = Sampling.weightedSamplePerGroup(df.repartition(9), "g", "w", 10, "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == out.toSet, "partitioning-invariant")
    // per-stratum draw must equal the global weightedSample restricted
    // to that stratum (same keys, same ordering rule)
    val globalS2 = Sampling.weightedSample(
      df.filter($"g" === "s2"), "w", 10, "id")
      .collect().map(_.getLong(1)).toSet
    assert(byG("s2") == globalS2)
  }

  test("weightedSample plans as TakeOrderedAndProject — no global sort") {
    val df = (1L to 100L).map(i => (i, 1.0)).toDF("id", "w")
    val plan = Sampling.weightedSample(df, "w", 5, "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"global sort leaked:\n$plan")
  }

  test("null keys are sampled, not silently dropped") {
    // 1000 null-key rows among 2000: nulls must appear in the sample at
    // ~the same rate as everything else (they hash via a sentinel), and
    // fraction 1.0 must agree with the hashed path in keeping them all
    val df = spark.range(0, 2000)
      .selectExpr("CASE WHEN id % 2 = 0 THEN id END AS k", "id AS payload")
    // nulls all share ONE sentinel hash, so at 0.5 they are kept
    // all-or-none per salt; md5("ns1" + sentinel) = 3c511df3 < 0.5 ⇒ kept,
    // md5("ns" + sentinel) = d7b14422 ≥ 0.5 ⇒ dropped — both legitimate,
    // neither silent (pre-fix, EVERY salt dropped them)
    val kept = Sampling.deterministicSample(df, "k", 0.5, "ns1")
      .filter($"k".isNull).count()
    assert(kept == 1000L, s"null-key rows not sampled as a sentinel key: $kept")
    val dropped = Sampling.deterministicSample(df, "k", 0.5, "ns")
      .filter($"k".isNull).count()
    assert(dropped == 0L)
    assert(Sampling.deterministicSample(df, "k", 1.0, "ns").count() == 2000)

    // deterministicSplit: null keys land in ONE split by their sentinel
    // hash (not force-routed to the last split) and none are lost
    val split = Sampling.deterministicSplit(df, "k",
      Seq("train" -> 0.8, "test" -> 0.2), "sp")
    assert(split.count() == 2000)
    assert(split.filter($"k".isNull).count() == 1000)

    // stratified: a null stratum samples at the default fraction's rate
    val strat = Sampling.deterministicStratifiedSample(
      df.selectExpr("CASE WHEN payload % 2 = 0 THEN 'a' END AS g", "payload"),
      "g", Map("a" -> 1.0), "payload", defaultFraction = 1.0)
    assert(strat.count() == 2000, "null-stratum rows dropped at defaultFraction=1.0")
  }

  test("quotaSample: duplicate (stratum, key) rows keep a partitioning-independent payload") {
    // n=1 over a stratum holding ONLY two rows duplicated on (g, k) but
    // differing in payload — their md5 ranks tie exactly, so without the
    // full-row-hash tie-break the survivor depended on input partitioning
    val df = (Seq(("dup", 1L, "payload-A"), ("dup", 1L, "payload-B")) ++
      (2L to 40L).map(i => ("other", i, s"p$i"))).toDF("g", "k", "t")
    def survivor(d: org.apache.spark.sql.DataFrame) =
      Sampling.quotaSample(d, "g", 1, "k", "qd")
        .filter($"g" === "dup").select("t").as[String].collect().toSet
    val a = survivor(df.repartition(1))
    val b = survivor(df.repartition(13, $"t"))
    val c = survivor(df.orderBy($"t".desc).repartition(5))
    assert(a.size == 1 && a == b && b == c,
      s"duplicate survivor depends on partitioning: $a vs $b vs $c")
  }

  test("quotaSample: map columns are fingerprint-safe (hashed via to_json)") {
    // Spark prohibits xxhash64 over MapType — the tie-break fingerprint
    // must route map-bearing columns through to_json, not reject the frame
    val d = (1L to 30L).map(i => (if (i % 2 == 0) "a" else "b", i))
      .toDF("g", "k")
      .withColumn("m", map(lit("x"), $"k"))
      .withColumn("nested", struct(map(lit("y"), $"k").as("inner")))
    val out = Sampling.quotaSample(d, "g", 5, "k", "mp")
    assert(out.count() == 10)
    assert(out.columns.toSeq == Seq("g", "k", "m", "nested"))
    // still deterministic under repartitioning
    val again = Sampling.quotaSample(d.repartition(7), "g", 5, "k", "mp")
    assert(out.select("k").as[Long].collect().toSet ==
      again.select("k").as[Long].collect().toSet)
  }

  test("mixCorporaByTokens: per-source rates from token budgets, deterministic") {
    // source a: 100 docs x 10 tokens = 1000 tokens, budget 250 -> rate 0.25
    // source b: 50 docs, budget above total -> keep all
    // source c: budget 0 -> drop all
    val a = (1L to 100L).map(i => (i, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")).toDF("id", "text")
    val b = (201L to 250L).map(i => (i, "w1 w2 w3 w4")).toDF("id", "text")
    val c = (301L to 320L).map(i => (i, "x1 x2")).toDF("id", "text")
    val out = Sampling.mixCorporaByTokens(
      Seq(("a", a, 250L), ("b", b, 10000L), ("c", c, 0L)), "id", "text", "s")
    val bySrc = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("b") == 50L)
    assert(!bySrc.contains("c"))
    val na = bySrc.getOrElse("a", 0L)
    assert(na > 100 * 0.25 * 0.4 && na < 100 * 0.25 * 2.2,
      s"source a kept $na of ~25 expected docs")
    // deterministic and partitioning-stable
    val again = Sampling.mixCorporaByTokens(
      Seq(("a", a.repartition(7), 250L), ("b", b, 10000L), ("c", c, 0L)),
      "id", "text", "s")
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
    // expected token mass of the kept sample ~ budget
    val toks = out.filter($"source" === "a").count() * 10
    assert(toks == na * 10)
  }

  test("packTokenWindows: exact-length sequences, docs split across boundaries") {
    // group g: weights 3, 7, 4, 0, 6 → stream of 20 tokens, L=8:
    // seq 0 = [0,8), seq 1 = [8,16), seq 2 = [16,20) partial
    val docs = Seq(
      ("g", 0L, 3L), ("g", 1L, 7L), ("g", 2L, 4L), ("g", 3L, 0L), ("g", 4L, 6L),
      ("h", 0L, 9L))
      .toDF("src", "doc_id", "w")
    val m = Sampling.packTokenWindows(docs, "w", 8, Seq("src"), "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getAs[Long]("seq_id"), r.getAs[Long]("doc_start"),
        r.getAs[Long]("seq_start"), r.getAs[Long]("n_tokens"))).toSet
    assert(m == Set(
      ("g", 0L, 0L, 0L, 0L, 3L),        // doc0 fully in seq0
      ("g", 1L, 0L, 0L, 3L, 5L),        // doc1 splits 5 + 2
      ("g", 1L, 1L, 5L, 0L, 2L),
      ("g", 2L, 1L, 0L, 2L, 4L),        // doc2 fully in seq1
      ("g", 4L, 1L, 0L, 6L, 2L),        // doc4 splits 2 + 4
      ("g", 4L, 2L, 2L, 0L, 4L),        // zero-weight doc3 absent
      ("h", 0L, 0L, 0L, 0L, 8L),        // doc splits 8 + 1 across seqs
      ("h", 0L, 1L, 8L, 0L, 1L)))
    // invariant: every non-final sequence holds exactly L tokens
    val bySeq = m.toSeq.groupBy(x => (x._1, x._3)).view.mapValues(_.map(_._6).sum)
    assert(bySeq(("g", 0L)) == 8L && bySeq(("g", 1L)) == 8L && bySeq(("g", 2L)) == 4L)
  }

  test("tokenPackingStats: totals, split-doc count, tail padding") {
    val docs = Seq(
      ("g", 0L, 3L), ("g", 1L, 7L), ("g", 2L, 4L), ("g", 4L, 6L),
      ("h", 0L, 9L))
      .toDF("src", "doc_id", "w")
    val m = Sampling.packTokenWindows(docs, "w", 8, Seq("src"), "doc_id")
    val st = Sampling.tokenPackingStats(m, "doc_id", 8, Seq("src"))
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("total_tokens"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_split_docs"),
        r.getAs[Long]("n_sequences"), r.getAs[Long]("tail_pad_tokens"))).toMap
    assert(st("g") == ((20L, 4L, 2L, 3L, 4L)))
    assert(st("h") == ((9L, 1L, 1L, 2L, 7L)))
  }

  test("assembleTokenWindows: sequences reassemble the exact token stream") {
    val docs = Seq(
      ("g", 0L, "a b c"), ("g", 1L, "d e f g h"), ("g", 2L, "  "), ("g", 3L, "i j"))
      .toDF("src", "doc_id", "text")
    val out = Sampling.assembleTokenWindows(docs, "text", 4, Seq("src"), "doc_id")
      .collect().map(r => (r.getAs[Long]("seq_id"),
        (r.getAs[String]("seq_text"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_tokens")))).toMap
    assert(out(0L) == (("a b c d", 2L, 4L)))
    assert(out(1L) == (("e f g h", 1L, 4L)))
    assert(out(2L) == (("i j", 1L, 2L)))      // blank doc placed nothing
  }

  test("shuffleDeterministic is a contiguous permutation matching md5 order") {
    val df = spark.range(0, 500).toDF("id")
    val got = Sampling.shuffleDeterministic(df, "id", "e1")
      .select("id", "position").as[(Long, Long)].collect().toMap
    // contiguous 0..n-1, one position per row
    assert(got.values.toSeq.sorted == (0L until 500L))
    // matches the single-task reference ordering exactly
    val want = (0L until 500L)
      .sortBy(id => org.apache.commons.codec.digest.DigestUtils.md5Hex("e1" + id))
      .zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    assert(got == want)
  }

  test("shuffleDeterministic: partitioning-invariant, salts independent") {
    val df = spark.range(0, 300).toDF("id")
    val a = Sampling.shuffleDeterministic(df, "id", "e1")
      .select("id", "position").as[(Long, Long)].collect().toMap
    val b = Sampling.shuffleDeterministic(df.repartition(7), "id", "e1",
      numPartitions = Some(3))
      .select("id", "position").as[(Long, Long)].collect().toMap
    assert(a == b)
    val c = Sampling.shuffleDeterministic(df, "id", "e2")
      .select("id", "position").as[(Long, Long)].collect().toMap
    assert(a != c) // a different epoch salt is a different permutation
  }
}
