package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** General graph operators over edge-list DataFrames — the public
  * facade over the large-star/small-star connected-components
  * machinery the dedup family runs internally
  * ([[graft.dedup.Dedup.duplicateClusters]]): entity resolution,
  * household/identity clustering, and any "group things linked by
  * pairs" task gets the same scale contract without going through the
  * dedup API.
  *
  * Scale shape (inherited): edge-grain exchanges only — large-star /
  * small-star alternation converges in O(log n) rounds with nothing
  * wider than (node, min-neighbour) aggregates; small graphs
  * (≤ `localMaxEdges`) short-circuit to one driver pass. Component
  * labels are the MINIMUM node id in the component (deterministic,
  * engine-replayable).
  */
object Graph {

  /** (node, component) for every node appearing in `edges`; edges are
    * undirected, self-loops ignored. `localMaxEdges = 0` forces the
    * distributed path (the spec/oracle hook). */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 20,
      localMaxEdges: Long = 1000000L): DataFrame =
    graft.dedup.Dedup.duplicateClusters(
      edges.select(col(srcCol).cast("long").as("id_a"),
        col(dstCol).cast("long").as("id_b")),
      maxIter, localMaxEdges)
      .select(col("id"), col("cluster_id").as("component"))

  /** One row per component: (component, n_nodes), largest first —
    * the cluster-size histogram entity-resolution reviews read. */
  def componentSizes(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 20,
      localMaxEdges: Long = 1000000L): DataFrame =
    connectedComponents(edges, srcCol, dstCol, maxIter, localMaxEdges)
      .groupBy("component").agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("n_nodes").desc, col("component"))

  /** Undirected degree per node (self-loops ignored, parallel edges
    * counted once). One distinct + one aggregation at edge grain. */
  def degrees(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val canon = edges.select(
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("u"),
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    canon.select(col("u").as("id"))
      .unionAll(canon.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
  }
}
