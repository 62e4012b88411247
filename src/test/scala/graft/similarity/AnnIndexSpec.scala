package graft.similarity

import graft.SparkTestBase

/** ANN artifact persistence: parquet round-trip exactness for centroids
  * and codebooks, loaded-index search ≡ freshly-trained search, and the
  * load-time grid validation. */
class AnnIndexSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val corpus = {
    val rnd = new scala.util.Random(11L)
    (0 until 150).map(i => (i.toLong, Array.fill(8)(rnd.nextGaussian())))
      .toDF("id", "vec")
  }

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_annidx").toString

  test("centers and codebooks round-trip parquet bit-exactly") {
    val (centers, codebooks) =
      Pq.trainIvfPq(corpus, "id", "vec", nlist = 8, m = 4, nCentroids = 16)
    val root = tmpRoot()
    AnnIndex.save(spark, centers, codebooks, root)
    val (lc, lcb) = AnnIndex.load(spark, root)
    assert(lc.length == centers.length)
    lc.zip(centers).foreach { case (a, b) => assert(a.sameElements(b)) }
    assert(lcb.length == codebooks.length)
    lcb.zip(codebooks).foreach { case (a, b) =>
      assert(a.length == b.length)
      a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
    }
  }

  test("search from loaded artifacts equals freshly-trained search") {
    val (centers, codebooks) =
      Pq.trainIvfPq(corpus, "id", "vec", nlist = 8, m = 4, nCentroids = 16)
    val root = tmpRoot()
    AnnIndex.save(spark, centers, codebooks, root)
    val (lc, lcb) = AnnIndex.load(spark, root)
    val queries = corpus.filter($"id" < 5)
      .selectExpr("id + 1000 AS id", "vec")
    def run(c: Array[Array[Double]], cb: Array[Array[Array[Double]]]) =
      Pq.ivfPqTopKFromArtifacts(corpus, queries, "id", "vec", k = 3,
        centers = c, codebooks = cb, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sortBy(x => (x._1, x._4)).toSeq
    assert(run(lc, lcb) == run(centers, codebooks))
  }

  test("ivfPqTopK equals trainIvfPq + ivfPqTopKFromArtifacts (refactor parity)") {
    val queries = corpus.filter($"id" < 5).selectExpr("id + 1000 AS id", "vec")
    val direct = Pq.ivfPqTopK(corpus, queries, "id", "vec", k = 3,
      nlist = 8, nprobe = 3, m = 4, nCentroids = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val (centers, codebooks) =
      Pq.trainIvfPq(corpus, "id", "vec", nlist = 8, m = 4, nCentroids = 16)
    val staged = Pq.ivfPqTopKFromArtifacts(corpus, queries, "id", "vec", k = 3,
      centers = centers, codebooks = codebooks, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(direct == staged)
  }

  test("load validates contiguity and rejects corrupt artifact tables") {
    val root = tmpRoot()
    // cells 0 and 2: a gap the assignment kernel would mis-index
    Seq((0, Seq(1.0, 2.0)), (2, Seq(3.0, 4.0))).toDF("cell", "centroid")
      .write.mode("overwrite").parquet(s"$root/centroids")
    val e = intercept[IllegalArgumentException](AnnIndex.loadCenters(spark, root))
    assert(e.getMessage.contains("contiguous"))
    // 3 of the 4 rows of a 2x2 grid
    Seq((0, 0, Seq(1.0)), (0, 1, Seq(2.0)), (1, 0, Seq(3.0)))
      .toDF("subspace", "code", "centroid")
      .write.mode("overwrite").parquet(s"$root/codebooks")
    val e2 = intercept[IllegalArgumentException](AnnIndex.loadCodebooks(spark, root))
    assert(e2.getMessage.contains("grid"))
    intercept[IllegalArgumentException](
      AnnIndex.save(spark, Array.empty[Array[Double]], Array(Array(Array(1.0))), root))
  }

  test("searchEncodedCorpus from the materialised index equals the fresh search") {
    val (centers, codebooks) =
      Pq.trainIvfPq(corpus, "id", "vec", nlist = 8, m = 4, nCentroids = 16)
    val root = tmpRoot()
    AnnIndex.save(spark, centers, codebooks, root)
    AnnIndex.saveEncodedCorpus(corpus, "id", "vec", centers, codebooks, root)
    val queries = corpus.filter($"id" < 5).selectExpr("id + 1000 AS id", "vec")
    val fresh = Pq.ivfPqTopKFromArtifacts(corpus, queries, "id", "vec", k = 3,
      centers = centers, codebooks = codebooks, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val served = AnnIndex.searchEncodedCorpus(spark, root, queries,
      "id", "vec", k = 3, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(served == fresh)
  }

  test("appendEncodedCorpus: served union equals fresh search over base + delta") {
    val base = corpus.filter($"id" < 100)
    val delta = corpus.filter($"id" >= 100)
      .selectExpr("id + 10000 AS id", "vec")
    val union = base.unionByName(delta)
    val (centers, codebooks) =
      Pq.trainIvfPq(base, "id", "vec", nlist = 8, m = 4, nCentroids = 16)
    val root = tmpRoot()
    AnnIndex.save(spark, centers, codebooks, root)
    AnnIndex.saveEncodedCorpus(base, "id", "vec", centers, codebooks, root)
    AnnIndex.appendEncodedCorpus(delta, "id", "vec", centers, codebooks, root)
    val queries = corpus.filter($"id" < 5).selectExpr("id + 1000 AS id", "vec")
    val fresh = Pq.ivfPqTopKFromArtifacts(union, queries, "id", "vec", k = 3,
      centers = centers, codebooks = codebooks, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val served = AnnIndex.searchEncodedCorpus(spark, root, queries,
      "id", "vec", k = 3, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(served == fresh)
  }

  test("encoded-corpus search reads only probed cells (partition pruning)") {
    val (centers, codebooks) =
      Pq.trainIvfPq(corpus, "id", "vec", nlist = 8, m = 4, nCentroids = 16)
    val root = tmpRoot()
    AnnIndex.save(spark, centers, codebooks, root)
    AnnIndex.saveEncodedCorpus(corpus, "id", "vec", centers, codebooks, root)
    val queries = corpus.filter($"id" < 2).selectExpr("id + 1000 AS id", "vec")
    val df = AnnIndex.searchEncodedCorpus(spark, root, queries,
      "id", "vec", k = 3, nprobe = 2)
    val plan = df.queryExecution.executedPlan.toString
    // the probed cell set must reach the scan as a SELECTIVE partition
    // filter (cell IN (...) / INSET), not just the join's isnotnull
    // residue — that is what skips unprobed cells' files
    val pf = plan.linesIterator.find(_.contains("PartitionFilters:"))
      .getOrElse(fail(s"no PartitionFilters in plan:\n$plan"))
    assert(pf.contains("cell#") && (pf.contains(" IN ") || pf.contains("INSET")),
      s"no selective cell pruning in: $pf")
  }
}
