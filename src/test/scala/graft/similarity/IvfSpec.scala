package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IvfSpec extends SparkTestBase {
  import spark.implicits._

  // clustered synthetic corpus: 3 well-separated directions + noise
  private def corpus = {
    val base = Seq(
      Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f), Array(0.0f, 0.0f, 1.0f))
    val rnd = new scala.util.Random(7)
    (0L until 90L).map { i =>
      val c = base((i % 3).toInt)
      val v = c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f)
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("buildIndex assigns every vector to one of nlist cells") {
    val (assignments, centroids) = Ivf.buildIndex(corpus, "vec_id", "embedding", nlist = 3)
    assert(assignments.count() == 90)
    assert(centroids.count() == 3)
    assert(assignments.select("cell").distinct().count() <= 3)
    // deterministic across runs with the same seed
    val (again, _) = Ivf.buildIndex(corpus, "vec_id", "embedding", nlist = 3)
    assert(assignments.orderBy("id").collect().map(_.getInt(2)).toSeq ==
      again.orderBy("id").collect().map(_.getInt(2)).toSeq)
  }

  test("ivfTopK with full probing equals brute force exactly") {
    val queries = corpus.filter($"vec_id" < 3)
    val ivf = Ivf.ivfTopK(corpus, queries, "vec_id", "embedding",
      k = 5, nlist = 3, nprobe = 3)
      .select("query_id", "corpus_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = Similarity.bruteForceTopKScalable(corpus, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "corpus_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivf == brute)
  }

  test("ivfTopK with 1 probe on clustered data keeps high recall") {
    val queries = corpus.filter($"vec_id" < 6)
    val ivf = Ivf.ivfTopK(corpus, queries, "vec_id", "embedding",
      k = 5, nlist = 3, nprobe = 1)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopKScalable(corpus, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall > 0.9, s"recall $recall too low for well-separated clusters")
  }

  test("trainSample caps the driver-side collect regardless of corpus size") {
    val sampled = corpus.select(col("vec_id").as("id"), col("embedding").as("vec"))
    assert(Ivf.trainSample(sampled, maxTrainRows = 10).length == 10)
    assert(Ivf.trainSample(sampled, maxTrainRows = 1000).length == 90)
  }

  test("trainSample under a cap is deterministic but NOT an id-prefix slice") {
    // encode the id into the vector so the selected rows are observable
    val tagged = spark.range(0, 1000)
      .select(col("id"), array(col("id").cast("double")).as("vec"))
    def pick() = Ivf.trainSample(tagged, maxTrainRows = 50).map(_.head.toLong).toSet
    val first = pick()
    assert(first == pick(), "capped training sample must be deterministic")
    // an orderBy(id).limit would return exactly 0..49 — a slice biased
    // toward the oldest rows when ids are monotonic; the hash ordering
    // must spread the sample across the id range
    assert(first != (0L until 50L).toSet,
      "capped training sample must not be the smallest-id prefix")
    assert(first.max > 500L, "sample should reach the upper half of the id range")
  }

  test("ivfTopK under a tiny maxTrainRows still matches brute force at full probe") {
    // centroid quality only shapes cells — a full probe scores everything
    val queries = corpus.filter($"vec_id" < 3)
    val ivf = Ivf.ivfTopK(corpus, queries, "vec_id", "embedding",
      k = 5, nlist = 3, nprobe = 3, maxTrainRows = 7)
      .select("query_id", "corpus_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = Similarity.bruteForceTopKScalable(corpus, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "corpus_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivf == brute)
  }

  test("search scores only probed cells") {
    val (assignments, centroids) = Ivf.buildIndex(corpus, "vec_id", "embedding", nlist = 3)
    val queries = corpus.filter($"vec_id" === 0)
    val out = Ivf.search(assignments, centroids, queries, "vec_id", "embedding",
      k = 100, nprobe = 1)
    // k > cell size: result bounded by the single probed cell's population
    val cellSizes = assignments.groupBy("cell").count()
      .collect().map(_.getLong(1))
    assert(out.count() <= cellSizes.max)
  }
}
