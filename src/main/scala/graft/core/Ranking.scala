package graft.core

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ColumnNotInDataframeError

/** Per-group ranking operators: exact top-k rows and argmax rows
  * without sorting whole groups through single tasks.
  *
  * The naive formulation — `row_number().over(partitionBy(group)
  * .orderBy(ord))` then `rank <= k` — shuffles EVERY row of a group
  * into one task and sorts it there; a billion-row group serialises on
  * one core. These operators keep the window (for its exact-rank
  * semantics) but only ever show it a bounded superset:
  *
  *  - [[topKPerGroup]]: each input partition first prunes to its local
  *    k best rows per group (bounded heap — the same partial-top-k
  *    move as `Similarity.bruteForceTopKScalable` and
  *    `Sampling.quotaSample`). Any global top-k row is in its
  *    partition's top-k, so the window sees ≤ k × partitions × groups
  *    rows instead of the corpus.
  *  - [[argmaxPerGroup]] (k = 1): purely declarative — ONE grouped
  *    `max_by` aggregation with map-side partial combine; no window,
  *    no heap, no per-group sort at all. Prefer it whenever k = 1.
  */
object Ranking {

  private def check(df: DataFrame, cols: Seq[String], what: String): Unit = {
    val missing = cols.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw new ColumnNotInDataframeError(
        s"$what: column(s) ${missing.mkString(", ")} not in dataframe " +
          s"(has: ${df.columns.mkString(", ")})")
  }

  /** Exact top-`k` rows of each group by `orderCol` (numeric;
    * `descending = true` keeps the largest), ties broken by `tieCol`
    * ascending — `tieCol` must be integral and unique within a group
    * (a primary key) for the result to be deterministic. Adds an
    * int `rank` column (1 = best). Rows with a null `orderCol` or
    * `tieCol` are excluded (a null has no defined rank).
    *
    * Scale shape: per-partition bounded-heap prune (O(k × groups seen
    * in the partition) memory) feeding an exact rank window over the
    * pruned superset. The heap orders by `(Double.compare, Long
    * .compare)` — the same total order Spark's sort uses for these
    * types, so the prune is consistent with the window by
    * construction. */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      k: Int,
      tieCol: String,
      descending: Boolean = true,
      rankCol: String = "rank"): DataFrame = {
    require(k >= 1, s"topKPerGroup: k must be >= 1, got $k")
    require(groupCols.nonEmpty, "topKPerGroup: need at least one group column")
    check(df, groupCols :+ orderCol :+ tieCol, "topKPerGroup")
    val ordName = "__graft_ord"
    val tieName = "__graft_tie"
    val base = df
      .filter(col(orderCol).isNotNull && col(tieCol).isNotNull)
      .withColumn(ordName, col(orderCol).cast("double"))
      .withColumn(tieName, col(tieCol).cast("long"))
    val schema = base.schema
    val gIdx = groupCols.map(schema.fieldIndex)
    val oIdx = schema.fieldIndex(ordName)
    val tIdx = schema.fieldIndex(tieName)
    val sign = if (descending) -1 else 1
    // (ord, tie) rank ordering: smaller = better
    val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = sign * java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    val pruned = base.mapPartitions { rows =>
      // max-heap on rank: peek = worst survivor, evict on better
      val heaps = scala.collection.mutable.HashMap
        .empty[Seq[Any], scala.collection.mutable.PriorityQueue[((Double, Long), Row)]]
      rows.foreach { r =>
        val key = gIdx.map(r.get)
        val rank = (r.getDouble(oIdx), r.getLong(tIdx))
        val heap = heaps.getOrElseUpdate(key,
          scala.collection.mutable.PriorityQueue.empty(
            Ordering.by((x: ((Double, Long), Row)) => x._1)(ord)))
        if (heap.size < k) heap.enqueue((rank, r))
        else if (ord.lt(rank, heap.head._1)) { heap.dequeue(); heap.enqueue((rank, r)) }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._2))
    }(org.apache.spark.sql.Encoders.row(schema))
    val ordExpr = if (descending) col(ordName).desc else col(ordName).asc
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(ordExpr, col(tieName).asc)
    pruned.withColumn(rankCol, row_number().over(w).cast("int"))
      .filter(col(rankCol) <= k)
      .drop(ordName, tieName)
  }

  /** The single best row of each group — `orderCol` maximised (or
    * minimised), ties broken by the LARGEST `tieCol` when maximising
    * and the smallest when minimising (one lexicographic struct
    * comparison; `tieCol` must be unique within a group for
    * determinism). Purely declarative: ONE `max_by`/`min_by` grouped
    * aggregation whose partial combine keeps a single candidate row
    * per group per map task — the k = 1 scale path, no window and no
    * heap. Null `orderCol`/`tieCol` rows are excluded. Output columns
    * = group columns + the winning row's remaining columns. */
  def argmaxPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      tieCol: String,
      maximize: Boolean = true): DataFrame = {
    require(groupCols.nonEmpty, "argmaxPerGroup: need at least one group column")
    check(df, groupCols :+ orderCol :+ tieCol, "argmaxPerGroup")
    val payloadCols = df.columns.filterNot(groupCols.contains).toSeq
    val pick = if (maximize) max_by _ else min_by _
    val picked = df
      .filter(col(orderCol).isNotNull && col(tieCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(pick(
        struct(payloadCols.map(col): _*),
        struct(col(orderCol), col(tieCol))).as("__graft_best"))
    picked.select(
      groupCols.map(col) ++
        payloadCols.map(c => col(s"__graft_best.$c").as(c)): _*)
  }
}
