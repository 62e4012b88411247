package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour search — the
  * coarse-quantizer scale path for embedding similarity.
  *
  * Index build: the quantizer is trained DRIVER-SIDE with a seeded
  * Lloyd iteration over a bounded sample of the corpus — the FAISS
  * recipe: even at 100 TB the coarse quantizer trains on ~1M sampled
  * vectors, so distributing the training loop buys nothing and costs a
  * full Spark job per iteration (measured: task-serialisation overhead
  * dominated the build). Assignment is MAP-SIDE: the nlist×dim
  * centroid table travels as a literal into a narrow argmin
  * projection — no shuffle, no per-iteration jobs.
  *
  * Search: each query scores only the vectors in its `nprobe` closest
  * cells, so the scored fraction is ≈ nprobe/nlist of the corpus —
  * the standard IVF recall/cost dial. The only wide exchange keys on
  * the cell id, so a 100 TB corpus shards by cell; per-query top-k
  * uses the bounded partial [[Similarity.TopKAggregator]].
  */
object Ivf {

  /** Seeded in-memory Lloyd k-means (squared-L2). Empty clusters keep
    * their previous centroid; k is capped at the sample size. */
  private[similarity] def localLloyd(
      points: Array[Array[Double]], k: Int, maxIter: Int, seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "localLloyd: empty training sample")
    val dim = points.head.length
    val kk = math.min(k, points.length)
    val rnd = new scala.util.Random(seed)
    val centers = rnd.shuffle(points.indices.toVector).take(kk)
      .map(points(_).clone).toArray
    val assign = new Array[Int](points.length)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      moved = false
      var p = 0
      while (p < points.length) {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          val cc = centers(c)
          val pp = points(p)
          var d = 0.0
          var j = 0
          while (j < dim) { val t = pp(j) - cc(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        if (assign(p) != best) { assign(p) = best; moved = true }
        p += 1
      }
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      var p2 = 0
      while (p2 < points.length) {
        val a = assign(p2)
        counts(a) += 1
        var j = 0
        while (j < dim) { sums(a)(j) += points(p2)(j); j += 1 }
        p2 += 1
      }
      var c2 = 0
      while (c2 < kk) {
        if (counts(c2) > 0) {
          var j = 0
          while (j < dim) { centers(c2)(j) = sums(c2)(j) / counts(c2); j += 1 }
        }
        c2 += 1
      }
      iter += 1
    }
    centers
  }

  /** Cell assignments for the corpus + the centroid table.
    * Returns (assignments: id/vec/cell, centroids: cell/centroid).
    *
    * `trainFraction` thins the training sample (seeded, deterministic);
    * `maxTrainRows` is the ABSOLUTE cap on what reaches the driver —
    * the collect is bounded by it regardless of corpus size (a
    * fraction alone scales linearly with the corpus: at 10B vectors
    * even 1% is a driver OOM). The cap plans as TakeOrderedAndProject:
    * every row is scanned once but each task keeps only a bounded
    * top-maxTrainRows heap, so executor and driver memory stay O(cap)
    * regardless of corpus size. Centroid quality only steers cell
    * SHAPES — it never changes which vectors a full probe scores.
    */
  def buildIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      seed: Long = 42L,
      maxIter: Int = 10,
      trainFraction: Double = 1.0,
      maxTrainRows: Int = 100000): (DataFrame, DataFrame) = {
    require(trainFraction > 0 && trainFraction <= 1.0,
      s"buildIndex: trainFraction must be in (0, 1], got $trainFraction")
    require(nlist >= 1, s"buildIndex: nlist must be >= 1, got $nlist")
    require(maxTrainRows >= 1,
      s"buildIndex: maxTrainRows must be >= 1, got $maxTrainRows")
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val sampled =
      if (trainFraction >= 1.0) base
      else base.sample(withReplacement = false, trainFraction, seed)
    buildIndexFromSample(base, nlist, maxIter, seed,
      trainSample(sampled, maxTrainRows))
  }

  /** [[buildIndex]] continuation from an already-collected train
    * sample — lets [[graft.similarity.Pq.ivfPqTopK]] feed the router
    * and the PQ codebooks from ONE bounded sampling job instead of
    * paying the TakeOrdered + collect twice. `base` must carry
    * (id, vec). */
  private[similarity] def buildIndexFromSample(
      base: DataFrame,
      nlist: Int,
      maxIter: Int,
      seed: Long,
      trainRows: Array[Array[Double]]): (DataFrame, DataFrame) = {
    val spark = base.sparkSession
    import spark.implicits._
    val centers = localLloyd(trainRows, nlist, maxIter, seed)

    // centroids ride into the scan as ONE flat reference object inside
    // the codegen'd argmin kernel (the PQ encoder at m=1, k=nlist,
    // raw-L2 mode): narrow projection, no join, no interpreted HOF —
    // the literal-array transform/aggregate formulation this replaces
    // ran nlist × dim lambda evals per row in the interpreted walker
    val assignments = base
      .withColumn("cell", element_at(
        graft.functions.HashFunctions.pqEncodeNative(
          col("vec").cast("array<double>"), Array(centers),
          normalize = false), 1))
    val centroids = centers.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("cell", "centroid")
    (assignments, centroids)
  }

  /** The bounded driver-side collect backing quantizer training: never
    * returns more than `maxTrainRows` vectors. Factored out so the
    * bound is unit-testable in isolation. */
  private[similarity] def trainSample(
      sampled: DataFrame, maxTrainRows: Int): Array[Array[Double]] = {
    val spark = sampled.sparkSession
    import spark.implicits._
    // Ordering by a hash of the id, not the id itself: a bare limit()'s
    // row selection depends on partition scan order (nondeterministic
    // run-to-run), while orderBy(id).limit takes the SMALLEST ids — a
    // systematically biased slice whenever ids correlate with time or
    // content (typical monotonic ids). xxhash64(id) is a deterministic
    // pseudo-random key, so the kept rows are an unbiased fixed sample;
    // the raw id tiebreaks duplicate hashes so ties are deterministic
    // too. The sort is bounded: TakeOrderedAndProject keeps only
    // maxTrainRows rows per task.
    sampled.orderBy(xxhash64(col("id")), col("id"))
      .limit(maxTrainRows)
      .select(col("vec").cast("array<double>"))
      .as[Array[Double]].collect()
  }

  /** Probe search: cosine top-k per query over the `nprobe` cells whose
    * centroids are closest (by cosine) to the query vector. */
  def search(
      assignments: DataFrame,
      centroids: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int,
      queryIdCol: String = "query_id"): DataFrame = {
    val q = queries.select(col(idCol).as(queryIdCol), col(vecCol).as("q_vec"))

    // rank cells per query by centroid cosine; nlist is small → the
    // exploded (query × cell) table stays tiny and broadcastable
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("c_sim", Similarity.cosine(col("q_vec"), col("centroid")))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(queryIdCol).orderBy(col("c_sim").desc, col("cell"))))
      .filter(col("rnk") <= nprobe)
      .select(col(queryIdCol), col("q_vec"), col("cell"))

    // score only the probed cells' members; shuffle keys on cell
    val scored = probes.join(assignments, Seq("cell"))
      .filter(col(queryIdCol) =!= col("id"))
      .select(col(queryIdCol),
        Similarity.cosine(col("q_vec"), col("vec")).as("sim"),
        col("id").cast("long").as("corpusId"))

    val topk = udaf(new Similarity.TopKAggregator(k))
    scored.groupBy(queryIdCol)
      .agg(topk(col("sim"), col("corpusId")).as("top"))
      .select(col(queryIdCol), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col(queryIdCol), col("t.corpusId").as("corpus_id"),
        col("t.sim").as("sim"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** Convenience: build + search in one call. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 64,
      nprobe: Int = 8,
      seed: Long = 42L,
      maxIter: Int = 10,
      trainFraction: Double = 1.0,
      maxTrainRows: Int = 100000): DataFrame = {
    val (assignments, centroids) =
      buildIndex(corpus, idCol, vecCol, nlist, seed, maxIter, trainFraction,
        maxTrainRows)
    search(assignments, centroids, queries, idCol, vecCol, k, nprobe)
  }
}
