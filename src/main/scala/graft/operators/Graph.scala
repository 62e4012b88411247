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
  *
  * Node ids must be INTEGRAL (byte/short/int/long): with ANSI off, a
  * silent cast("long") would null string/UUID ids and fractional
  * doubles would truncate — edges vanishing without an error is the
  * worst failure mode for entity resolution, so non-integral id
  * columns fail loudly instead. String/UUID ids: derive a long key
  * first (e.g. `xxhash64(col)`, keeping a (hash, id) mapping frame to
  * translate components back).
  */
object Graph {

  private val integral: Set[org.apache.spark.sql.types.DataType] = Set(
    org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
    org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)

  private def requireIntegralIds(
      edges: DataFrame, srcCol: String, dstCol: String, op: String): Unit =
    Seq(srcCol, dstCol).foreach { c =>
      val dt = edges.schema(c).dataType
      require(integral.contains(dt),
        s"$op: node id column '$c' is ${dt.sql}, need an integral type — " +
          "a silent cast would null non-numeric ids (edges vanish) or " +
          "truncate fractional ones; hash string ids to long first " +
          "(xxhash64) and keep a mapping frame")
    }

  /** (node, component) for every node appearing in `edges`; edges are
    * undirected, self-loops ignored. `localMaxEdges = 0` forces the
    * distributed path (the spec/oracle hook). */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 20,
      localMaxEdges: Long = 1000000L): DataFrame = {
    requireIntegralIds(edges, srcCol, dstCol, "connectedComponents")
    graft.dedup.Dedup.duplicateClusters(
      edges.select(col(srcCol).cast("long").as("id_a"),
        col(dstCol).cast("long").as("id_b")),
      maxIter, localMaxEdges)
      .select(col("id"), col("cluster_id").as("component"))
  }

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
    requireIntegralIds(edges, srcCol, dstCol, "degrees")
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
