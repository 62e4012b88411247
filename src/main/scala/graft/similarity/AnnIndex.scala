package graft.similarity

import org.apache.spark.sql.SparkSession

/** Parquet persistence for trained ANN artifacts — the IVF coarse
  * centroids and PQ codebooks of [[Pq.trainIvfPq]] — so a pipeline
  * trains ONCE and every later run (or a different engine reading the
  * same files) reuses the index instead of re-running the sampling
  * scan + driver k-means per job. Same round-trip pattern as the
  * persistable HLL sketches (graft.core.Sketches): fixed-width rows,
  * plain parquet, no engine-private serialisation.
  *
  * Layout under `root`:
  *   root/centroids — (cell INT, centroid ARRAY&lt;DOUBLE&gt;), one row
  *     per coarse cell, cells contiguous 0..nlist−1
  *   root/codebooks — (subspace INT, code INT, centroid
  *     ARRAY&lt;DOUBLE&gt;), one row per codebook entry, (subspace, code)
  *     contiguous over [0, m) × [0, k)
  *
  * Doubles round-trip parquet bit-exactly, so a loaded index
  * reproduces the trained one's cell assignments and ADC scores
  * EXACTLY ([[Pq.ivfPqTopKFromArtifacts]] over a load equals the
  * freshly-trained search under the same seed — pinned by AnnIndexSpec
  * and the q_ann_persist oracle). Artifacts are driver-modest by the
  * quantizers' nature (nlist × dim + m × k × dim/m doubles), so the
  * loads collect bounded tables, never corpus data.
  */
object AnnIndex {

  /** Persist a trained artifact pair under `root` (overwrites). */
  def save(
      spark: SparkSession,
      centers: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      root: String): Unit = {
    import spark.implicits._
    require(centers.nonEmpty, "AnnIndex.save: empty centroid table")
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "AnnIndex.save: empty codebooks")
    centers.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/centroids")
    (for {
      (cb, s) <- codebooks.toSeq.zipWithIndex
      (c, i) <- cb.toSeq.zipWithIndex
    } yield (s, i, c.toSeq))
      .toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/codebooks")
  }

  /** Load the coarse centroids written by [[save]], validating the
    * cell ids are the contiguous range the assignment kernel indexes
    * by. */
  def loadCenters(spark: SparkSession, root: String): Array[Array[Double]] = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$root/centroids")
      .select($"cell".cast("int"), $"centroid".cast("array<double>"))
      .as[(Int, Array[Double])].collect()
    require(rows.nonEmpty, s"AnnIndex.loadCenters: no centroids at $root/centroids")
    require(rows.map(_._1).sorted.sameElements(rows.indices),
      s"AnnIndex.loadCenters: cell ids not contiguous 0..${rows.length - 1}")
    rows.sortBy(_._1).map(_._2)
  }

  /** Load the PQ codebooks written by [[save]], validating
    * (subspace, code) covers a full m × k grid. */
  def loadCodebooks(spark: SparkSession, root: String): Array[Array[Array[Double]]] = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$root/codebooks")
      .select($"subspace".cast("int"), $"code".cast("int"),
        $"centroid".cast("array<double>"))
      .as[(Int, Int, Array[Double])].collect()
    require(rows.nonEmpty, s"AnnIndex.loadCodebooks: no codebooks at $root/codebooks")
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    require(rows.length == m * k,
      s"AnnIndex.loadCodebooks: expected full $m x $k grid, got ${rows.length} rows")
    val out = Array.ofDim[Array[Double]](m, k)
    rows.foreach { case (s, c, v) =>
      require(out(s)(c) == null,
        s"AnnIndex.loadCodebooks: duplicate (subspace=$s, code=$c)")
      out(s)(c) = v
    }
    out
  }

  /** [[loadCenters]] + [[loadCodebooks]] in one call. */
  def load(
      spark: SparkSession,
      root: String): (Array[Array[Double]], Array[Array[Array[Double]]]) =
    (loadCenters(spark, root), loadCodebooks(spark, root))

  /** Materialise the ENCODED corpus under the same index root: one
    * wide vector scan computes (id, cell, code) via the codegen
    * kernels, written cell-PARTITIONED parquet (`root/encoded`). This
    * is the other half of train-once/serve-many: [[save]] persists the
    * quantizers, this persists their application, so serving reads
    * m-byte codes instead of re-scanning and re-encoding 256 B vectors
    * per query batch — and because `cell` is the partition key, a
    * search's broadcast probe join dynamic-partition-prunes the
    * unprobed cells at the file level (~nprobe/nlist of the index
    * touched, on top of the 32× code-vs-vector width cut). */
  def saveEncodedCorpus(
      corpus: org.apache.spark.sql.DataFrame,
      idCol: String,
      vecCol: String,
      centers: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      root: String): Unit =
    encodeFrame(corpus, idCol, vecCol, centers, codebooks)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$root/encoded")

  /** The shared (id, cell, code) encode projection — one narrow pass
    * through the codegen kernels. */
  private def encodeFrame(
      corpus: org.apache.spark.sql.DataFrame,
      idCol: String,
      vecCol: String,
      centers: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val base = corpus.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    base.select(col("id"),
      element_at(graft.functions.HashFunctions.pqEncodeNative(
        col("vec"), Array(centers), normalize = false), 1).as("cell"),
      graft.functions.HashFunctions.pqEncodeNative(
        col("vec"), codebooks).as("code"))
  }

  /** Append a DELTA corpus to an existing encoded index — incremental
    * index growth without retraining or re-encoding the base: new
    * vectors are assigned to the FROZEN cells and codebooks (the
    * standard incremental-IVF contract; recall for the delta matches
    * the base as long as the trained distribution still covers it) and
    * land in the same cell-partitioned layout, so serving picks them
    * up with no further work. Caller contract: delta ids must be
    * disjoint from everything already in the index — the searcher does
    * not dedup. */
  def appendEncodedCorpus(
      corpus: org.apache.spark.sql.DataFrame,
      idCol: String,
      vecCol: String,
      centers: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      root: String): Unit =
    encodeFrame(corpus, idCol, vecCol, centers, codebooks)
      .write.mode("append").partitionBy("cell").parquet(s"$root/encoded")

  /** Serve IVF-PQ top-k from a FULLY materialised index (artifacts via
    * [[load]], codes via the `root/encoded` table): zero training
    * jobs, zero vector scans — the plan reads only the probed cells'
    * code files. Bit-identical to [[Pq.ivfPqTopKFromArtifacts]] over
    * the original corpus (ints and doubles round-trip parquet exactly;
    * pinned by AnnIndexSpec and q_ann_index_scan). */
  def searchEncodedCorpus(
      spark: SparkSession,
      root: String,
      queries: org.apache.spark.sql.DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 8,
      queryIdCol: String = "query_id"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val (centers, codebooks) = load(spark, root)
    val encoded = spark.read.parquet(s"$root/encoded")
      .select(col("id").cast("long").as("id"), col("cell").cast("int").as("cell"),
        col("code").cast("array<int>").as("code"))
    val centroids = centers.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("cell", "centroid")
    Pq.ivfPqSearchEncoded(encoded, centroids, queries, idCol, vecCol,
      codebooks, k, nprobe, queryIdCol, pruneCells = true)
  }
}
