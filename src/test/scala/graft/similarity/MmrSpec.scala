package graft.similarity

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MmrSpec extends SparkTestBase {
  import spark.implicits._

  // a and b are near-duplicates of each other (sim ~0.99999), c is
  // diverse (sim to a ~0.855): plain relevance ranks (a, b, c) but at
  // λ=0.5 the margin rel − maxsim is −0.025 for b and +0.022 for c,
  // so MMR must pick c second — the de-redundancy behaviour the
  // operator exists for
  private def embeddings = Seq(
    (100L, Array(0.95f, 0.3122f, 0f)),   // a: rel ~0.950
    (101L, Array(0.9495f, 0.3137f, 0f)), // b: near-copy of a, rel ~0.9495
    (102L, Array(0.9f, 0f, 0.4359f)),    // c: diverse, rel ~0.900
    (1L, Array(1.0f, 0.0f, 0.0f)))       // the query vector
    .toDF("id", "vec")

  private def candidates = {
    val emb = embeddings
    Similarity.bruteForceTopK(
      emb.filter($"id" >= 100L), emb.filter($"id" === 1L), "id", "vec", k = 3)
      .select($"query_id", $"corpus_id", $"sim".as("rel"))
  }

  test("diversity beats raw relevance from the second pick on") {
    val out = Similarity.mmrRerank(candidates, embeddings, "id", "vec",
      k = 3, lambda = 0.5)
      .collect().map(r => r.getInt(2) -> r.getLong(1)).toMap
    assert(out == Map(1 -> 100L, 2 -> 102L, 3 -> 101L),
      s"expected a, then the diverse c, then the near-dup b; got $out")
  }

  test("rank 1 is the relevance argmax and scores are monotone non-increasing") {
    val rows = Similarity.mmrRerank(candidates, embeddings, "id", "vec",
      k = 3, lambda = 0.5)
      .orderBy("rank").collect()
    assert(rows.head.getLong(1) == 100L)
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y },
      s"greedy MMR scores must not increase: ${scores.toSeq}")
  }

  test("queries with fewer than k candidates return what they have") {
    val out = Similarity.mmrRerank(candidates, embeddings, "id", "vec",
      k = 10, lambda = 0.5)
    assert(out.count() == 3)
  }

  test("empty candidates return an empty frame, not an NPE") {
    val out = Similarity.mmrRerank(candidates.limit(0), embeddings,
      "id", "vec", k = 3, lambda = 0.5)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("query_id", "corpus_id", "rank", "mmr_score"))
  }

  test("a candidate id missing from embeddings fails loudly") {
    // id 999 has no vector: it would be silently unpickable after
    // rank 1 (no pairwise cosine row) — the operator must refuse
    val extra = candidates.unionByName(
      Seq((1L, 999L, 0.4)).toDF("query_id", "corpus_id", "rel"))
    val e = intercept[IllegalArgumentException](
      Similarity.mmrRerank(extra, embeddings, "id", "vec", k = 3, lambda = 0.5))
    assert(e.getMessage.contains("no row in"))
  }

  test("duplicate embedding ids for a candidate fail loudly on BOTH routes") {
    // ADVICE r16: the driver route's toMap would keep an arbitrary
    // (collect-order-dependent) duplicate while the distributed route
    // aggregates max(psim) over all of them — the spec-pinned-identical
    // routes could diverge nondeterministically; both must refuse
    val dupEmb = embeddings.unionByName(
      Seq((101L, Array(0.1f, 0.2f, 0.3f))).toDF("id", "vec"))
    for (conf <- Seq("1000000", "0")) { // driver route, distributed route
      spark.conf.set(Similarity.MmrSmallPoolRowsConf, conf)
      try {
        val e = intercept[IllegalArgumentException](
          Similarity.mmrRerank(candidates, dupEmb, "id", "vec",
            k = 3, lambda = 0.5).collect())
        assert(e.getMessage.contains("duplicate"), s"conf=$conf: $e")
      } finally spark.conf.unset(Similarity.MmrSmallPoolRowsConf)
    }
  }

  test("driver and distributed routes pick identically, scores bit-for-bit") {
    // 3 queries × 40 deterministic float vectors: big enough that ties
    // and the rounding grid are exercised, small enough that the
    // default conf routes it to the driver loop
    val emb = spark.range(120).select(col("id"),
      transform(sequence(lit(0), lit(7)), i =>
        ((pmod(xxhash64(col("id"), i), lit(1000)).cast("double") / 500.0)
          - 1.0).cast("float")).as("vec"))
    val cands = spark.range(120).select(
      (col("id") % 3 + 500).as("query_id"), col("id").as("corpus_id"),
      (pmod(xxhash64(col("id")), lit(1000)).cast("double") / 1000.0).as("rel"))
    def picks(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)) ->
        java.lang.Double.doubleToLongBits(r.getDouble(3))).toMap
    val viaDriver = picks(
      Similarity.mmrRerank(cands, emb, "id", "vec", k = 7, lambda = 0.6))
    spark.conf.set(Similarity.MmrSmallPoolRowsConf, "0")
    val viaDist = try picks(
      Similarity.mmrRerank(cands, emb, "id", "vec", k = 7, lambda = 0.6))
      finally spark.conf.unset(Similarity.MmrSmallPoolRowsConf)
    assert(viaDriver.size == 21 && viaDriver == viaDist,
      s"routes diverged:\ndriver: $viaDriver\ndistributed: $viaDist")
  }

  test("null corpus_id or rel in candidates fails loudly (unpickable, not 0-valued)") {
    val withNullRel = candidates.unionByName(
      Seq((1L, java.lang.Long.valueOf(102L), Option.empty[Double]))
        .toDF("query_id", "corpus_id", "rel"))
    val e1 = intercept[IllegalArgumentException](
      Similarity.mmrRerank(withNullRel, embeddings, "id", "vec", k = 2))
    assert(e1.getMessage.contains("null"))
    val withNullId = candidates.unionByName(
      Seq((1L, Option.empty[Long], Option(0.5)))
        .toDF("query_id", "corpus_id", "rel"))
    val e2 = intercept[IllegalArgumentException](
      Similarity.mmrRerank(withNullId, embeddings, "id", "vec", k = 2))
    assert(e2.getMessage.contains("null"))
  }

  test("candidate bound and parameters validate loudly") {
    assertThrows[IllegalArgumentException](
      Similarity.mmrRerank(candidates, embeddings, "id", "vec", k = 0))
    assertThrows[IllegalArgumentException](
      Similarity.mmrRerank(candidates, embeddings, "id", "vec", k = 2, lambda = 1.5))
    assertThrows[IllegalArgumentException](
      Similarity.mmrRerank(candidates, embeddings, "id", "vec",
        k = 2, maxCandidatesPerQuery = 2))
  }
}
