package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour search — the
  * coarse-quantizer scale path for embedding similarity.
  *
  * Index build: k-means (MLlib, seeded → deterministic) partitions the
  * corpus into `nlist` cells; every vector is assigned to its nearest
  * centroid. Search: each query scores only the vectors in its
  * `nprobe` closest cells, so the scored fraction is ≈ nprobe/nlist of
  * the corpus instead of all of it — the standard FAISS-style IVF
  * recall/cost dial.
  *
  * Scale design: centroids (nlist × dim doubles) broadcast to both
  * assignment and probing; the only wide exchange keys on the cell id,
  * so a 100 TB corpus shards by cell; per-query top-k uses the bounded
  * partial [[Similarity.TopKAggregator]].
  */
object Ivf {

  /** Cell assignments for the corpus + the centroid table.
    * Returns (assignments: id/vec/cell, centroids: cell/centroid). */
  def buildIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      seed: Long = 42L): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    val vectorized = corpus.select(
      col(idCol).as("id"), col(vecCol).as("vec"),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setFeaturesCol("features")
      .setPredictionCol("cell")
      .fit(vectorized)
    val assignments = model.transform(vectorized)
      .select(col("id"), col("vec"), col("cell"))
    val centroids = spark.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }.toSeq)
      .toDF("cell", "centroid")
    (assignments, centroids)
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
      seed: Long = 42L): DataFrame = {
    val (assignments, centroids) = buildIndex(corpus, idCol, vecCol, nlist, seed)
    search(assignments, centroids, queries, idCol, vecCol, k, nprobe)
  }
}
