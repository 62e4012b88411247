package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Product quantization: codebook shapes and determinism, encode
  * bounds, reconstruction quality, the m=1/k=n exactness degenerate
  * case, and planted-neighbour retrieval through the full
  * train→encode→ADC path. */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic synthetic corpus: 120 vectors, dim 8, values from a
  // seeded generator — shared across tests
  private lazy val corpus = {
    val rnd = new scala.util.Random(7L)
    (0 until 120).map(i => (i.toLong, Array.fill(8)(rnd.nextGaussian())))
      .toDF("id", "vec")
  }

  test("trainCodebooks: shapes, code-range contract, determinism") {
    val cb = Pq.trainCodebooks(corpus, "id", "vec", m = 4, k = 16)
    assert(cb.length == 4)
    assert(cb.forall(_.length == 16))
    assert(cb.forall(_.forall(_.length == 2)))
    val cb2 = Pq.trainCodebooks(corpus, "id", "vec", m = 4, k = 16)
    assert(cb.flatten.flatten.toSeq == cb2.flatten.flatten.toSeq,
      "same seed must yield identical codebooks")
    val enc = Pq.encode(corpus, "id", "vec", cb)
    val codes = enc.select("code").as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 16)))
  }

  test("trainCodebooks rejects bad shapes") {
    intercept[IllegalArgumentException](
      Pq.trainCodebooks(corpus, "id", "vec", m = 3)) // 8 % 3 != 0
    intercept[IllegalArgumentException](
      Pq.trainCodebooks(corpus, "id", "vec", m = 2, k = 300))
  }

  test("reconstruction approximates the normalised vector") {
    val cb = Pq.trainCodebooks(corpus, "id", "vec", m = 4, k = 32)
    val enc = Pq.encode(corpus, "id", "vec", cb)
    val joined = enc.join(corpus, "id")
      .withColumn("nv", Pq.l2normalize(col("vec").cast("array<double>")))
      .withColumn("rec", Pq.reconstruct(col("code"), cb))
      .withColumn("cos", Similarity.cosine(col("nv"), col("rec")))
    val meanCos = joined.agg(avg("cos")).as[Double].head()
    // 4 subspaces × 32 centroids on 120 gaussian vectors: reconstruction
    // keeps most of the direction; the bound is deliberately loose —
    // it guards "decoder matches encoder", not codebook quality
    assert(meanCos > 0.8, s"mean reconstruction cosine $meanCos <= 0.8")
  }

  test("m=1, k=n degenerates to exact search: ADC top-k == brute force") {
    // 20 points, one subspace, 20 centroids: Lloyd converges to the
    // points themselves, so quantization is lossless and ADC ranking
    // must equal exact cosine ranking
    val rnd = new scala.util.Random(11L)
    val tiny = (0 until 20).map(i => (i.toLong, Array.fill(4)(rnd.nextGaussian())))
      .toDF("id", "vec")
    val cb = Pq.trainCodebooks(tiny, "id", "vec", m = 1, k = 20, maxIter = 50)
    val queries = tiny.filter(col("id") < 3)
    val got = Pq.adcTopK(Pq.encode(tiny, "id", "vec", cb), queries,
        "id", "vec", cb, k = 5)
      .select("query_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val expected = Similarity.bruteForceTopK(tiny, queries, "id", "vec", k = 5)
      .select(col("query_id").cast("long"), col("corpus_id"),
        col("rank").cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == expected,
      s"lossless PQ must reproduce brute-force ranking\n got=$got\n exp=$expected")
  }

  test("planted near-identical neighbours are retrieved at rank 1") {
    // queries are tiny perturbations of corpus vectors 0..9 (cosine
    // ~0.9999): with 16 centroids per 2-dim subspace the perturbed
    // query must land on its source's codes' neighbourhood
    val queries = corpus.filter(col("id") < 10)
      .select((col("id") + 1000L).as("id"),
        transform(col("vec"), x => x + lit(0.001)).as("vec"))
    val cb = Pq.trainCodebooks(corpus, "id", "vec", m = 4, k = 64)
    val top1 = Pq.adcTopK(Pq.encode(corpus, "id", "vec", cb), queries,
        "id", "vec", cb, k = 3)
      .filter(col("rank") === 1)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toMap
    val hits = (0L until 10L).count(i => top1.get(i + 1000L).contains(i))
    assert(hits >= 9, s"only $hits/10 planted neighbours at rank 1 (need >= 9)")
  }

  test("ivfPqTopK: full probe + lossless codebooks == brute force exactly") {
    // nprobe = nlist (every cell probed) and m=1/k=n (lossless PQ):
    // the composed path must reproduce exact cosine ranking
    val rnd = new scala.util.Random(13L)
    val tiny = (0 until 24).map(i => (i.toLong, Array.fill(4)(rnd.nextGaussian())))
      .toDF("id", "vec")
    val queries = tiny.filter(col("id") < 3)
    val got = Pq.ivfPqTopK(tiny, queries, "id", "vec", k = 5,
        nlist = 4, nprobe = 4, m = 1, nCentroids = 24, maxIter = 50)
      .select("query_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val expected = Similarity.bruteForceTopK(tiny, queries, "id", "vec", k = 5)
      .select(col("query_id").cast("long"), col("corpus_id"),
        col("rank").cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == expected,
      s"full-probe lossless IVF-PQ must match brute force\n got=$got\n exp=$expected")
  }

  test("ivfPqTopK: planted neighbours survive routed probing (nprobe < nlist)") {
    // a perturbed copy routes to the same (or a probed-adjacent) cell
    // as its source: with nprobe=4 of nlist=8 the planted pair must
    // still be retrieved at rank 1
    val queries = corpus.filter(col("id") < 10)
      .select((col("id") + 1000L).as("id"),
        transform(col("vec"), x => x + lit(0.001)).as("vec"))
    val top1 = Pq.ivfPqTopK(corpus, queries, "id", "vec", k = 3,
        nlist = 8, nprobe = 4, m = 4, nCentroids = 64)
      .filter(col("rank") === 1)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toMap
    val hits = (0L until 10L).count(i => top1.get(i + 1000L).contains(i))
    assert(hits >= 9, s"only $hits/10 planted neighbours at rank 1 (need >= 9)")
  }

  test("encode on array<float> input (the parquet embedding shape) matches the cast-to-double path") {
    val floatCorpus = corpus.select(col("id"),
      col("vec").cast("array<float>").as("vec"))
    val cb = Pq.trainCodebooks(corpus, "id", "vec", m = 4, k = 16)
    // encode reads float natively (kernel isFloat branch, no in-plan
    // cast); float32 rounding can flip a genuine near-tie argmin, so
    // the comparison baseline is encode(double(float)) — the same
    // values at the same precision through the double branch
    val viaFloat = Pq.encode(floatCorpus, "id", "vec", cb)
      .select("id", "code").as[(Long, Seq[Int])].collect().toMap
    val viaDouble = Pq.encode(
        floatCorpus.select(col("id"), col("vec").cast("array<double>").as("vec")),
        "id", "vec", cb)
      .select("id", "code").as[(Long, Seq[Int])].collect().toMap
    assert(viaFloat == viaDouble)
  }

  test("recallAtK: exact fractions, missing queries count as zero, rank cutoff respected") {
    def frame(rows: (Long, Long, Int)*) =
      rows.toSeq.toDF("query_id", "corpus_id", "rank")
    val exact = frame((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1), (2L, 21L, 2))
    // query 1: one of two exact ids found; query 2: absent from approx
    // entirely -> recall 0, still counted
    val approx = frame((1L, 10L, 1), (1L, 99L, 2))
    val r = Similarity.recallAtK(approx, exact, 2).as[(Long, Double)].head()
    assert(r == ((2L, 0.25)), s"expected (2, 0.25), got $r")
    // a hit OUTSIDE the approx top-k must not count: id 11 at rank 3
    val approx2 = frame((1L, 10L, 1), (1L, 99L, 2), (1L, 11L, 3))
    val r2 = Similarity.recallAtK(approx2, exact, 2).as[(Long, Double)].head()
    assert(r2 == ((2L, 0.25)), s"rank cutoff violated: $r2")
    // identical frames -> perfect recall
    val r3 = Similarity.recallAtK(exact, exact, 2).as[(Long, Double)].head()
    assert(r3 == ((2L, 1.0)))
  }

  test("pqTopK output contract: ranks dense from 1, scores non-increasing, no self") {
    val out = Pq.pqTopK(corpus, corpus.filter(col("id") < 5), "id", "vec",
      k = 4, m = 4, nCentroids = 16)
    val rows = out.select("query_id", "corpus_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(rows.length == 20)
    rows.groupBy(_._1).foreach { case (q, g) =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to 4), s"ranks not dense for $q")
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sortBy(-(_: Double)).toSeq,
        s"scores not non-increasing for $q")
      assert(!g.exists(_._2 == q), s"self match leaked for $q")
    }
  }
}
