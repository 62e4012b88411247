package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ColumnNotInDataframeError
import graft.functions.StringSimilarity

/** Blocked record linkage: match records across two tables on fuzzy
  * field agreement — the entity-resolution step (same supplier, same
  * author, same web domain) that exact joins cannot do once names
  * drift. Candidate pairs come from an EQUI-join on a blocking key
  * (records that disagree on the block are never compared — the move
  * that keeps the O(len²)-per-pair scoring off the cross join), each
  * candidate scores a weighted average of per-field Jaro-Winkler
  * similarities (the native codegen kernel — no UDF fence), and pairs
  * at or above `threshold` are links.
  *
  * Scale shape: one shuffle on the blocking key; the scoring is a
  * narrow codegen'd projection over candidate pairs only. Blocking
  * quality is the scale lever — pair counts are quadratic in block
  * size, so block on something selective (sorted-neighborhood keys,
  * phonetic codes, multi-pass with different blocks) exactly as in
  * classical record linkage practice.
  */
object Linkage {

  private def check(df: DataFrame, cols: Seq[String], what: String): Unit = {
    val missing = cols.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw new ColumnNotInDataframeError(
        s"$what: column(s) ${missing.mkString(", ")} not in dataframe " +
          s"(has: ${df.columns.mkString(", ")})")
  }

  /** Links between `a` and `b`: `(id_a, id_b, score)` (9 dp), score =
    * Σ wᵢ·jw(fieldᵢ) / Σ wᵢ over `fields` as (name, weight) pairs. A
    * null field on either side contributes 0 similarity at full
    * weight — absence is treated as disagreement, not ignored (an
    * ignored-and-renormalised null would let a record with one
    * surviving field lottery its way over the threshold). */
  def linkRecords(
      a: DataFrame,
      b: DataFrame,
      idCol: String,
      blockCol: String,
      fields: Seq[(String, Double)],
      threshold: Double): DataFrame = {
    require(fields.nonEmpty, "linkRecords: need at least one field")
    require(fields.forall(_._2 > 0.0), "linkRecords: weights must be > 0")
    require(threshold >= 0.0 && threshold <= 1.0,
      s"linkRecords: threshold must be in [0, 1], got $threshold")
    val names = fields.map(_._1)
    check(a, names :+ idCol :+ blockCol, "linkRecords(a)")
    check(b, names :+ idCol :+ blockCol, "linkRecords(b)")
    val aSel = a.select(col(idCol).as("id_a") +: col(blockCol).as("__blk") +:
      names.map(f => col(f).as(s"__a_$f")): _*)
    val bSel = b.select(col(idCol).as("id_b") +: col(blockCol).as("__blk") +:
      names.map(f => col(f).as(s"__b_$f")): _*)
    val wSum = fields.map(_._2).sum
    val score = fields.map { case (f, w) =>
      lit(w) * coalesce(
        StringSimilarity.jaroWinkler(col(s"__a_$f"), col(s"__b_$f")), lit(0.0))
    }.reduce(_ + _) / lit(wSum)
    aSel.join(bSel, "__blk")
      .withColumn("__score", score)
      .filter(col("__score") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("__score"), 9).as("score"))
  }

  /** Sorted-neighborhood candidate pairs (the classical complement to
    * equi-blocking): sort the table on `sortCols` and emit every pair
    * of rows at rank distance ≤ `window` — catches near-matches that
    * straddle an equi-block boundary ("acme corp" / "acmecorp" block
    * apart on substr but sort adjacent). Output `(id_a, id_b,
    * rank_gap)` with id_a the lower-ranked row; `sortCols` must be a
    * unique total order (end with the id), the
    * [[Ids.assignContiguousIds]] contract.
    *
    * Scale shape: ranks come from the contiguous-id partition-offset
    * pattern (no single-task global window), and the O(n·window) pair
    * generation is TWO equi-joins at rank-block grain (same block +
    * adjacent block — any pair within `window` spans at most two
    * `window`-sized blocks), never a rank-range theta join. */
  def sortedNeighborhoodPairs(
      df: DataFrame,
      idCol: String,
      sortCols: Seq[String],
      window: Int): DataFrame = {
    require(window >= 1, s"sortedNeighborhoodPairs: window must be >= 1, got $window")
    check(df, idCol +: sortCols, "sortedNeighborhoodPairs")
    val ranked = Ids.assignContiguousIds(df.select((idCol +: sortCols)
        .distinct.map(col): _*), sortCols, "__sn_rank")
      .select(col(idCol), col("__sn_rank"),
        (col("__sn_rank") / window).cast("long").as("__sn_blk"))
    val a = ranked.select(col(idCol).as("id_a"), col("__sn_rank").as("__ra"),
      col("__sn_blk").as("__ba"))
    val b = ranked.select(col(idCol).as("id_b"), col("__sn_rank").as("__rb"),
      col("__sn_blk").as("__bb"))
    val same = a.join(b, col("__ba") === col("__bb"))
    val adjacent = a.join(b, col("__ba") + 1 === col("__bb"))
    same.unionByName(adjacent)
      .withColumn("rank_gap", (col("__rb") - col("__ra")).cast("long"))
      .filter(col("rank_gap") > 0 && col("rank_gap") <= window)
      .select(col("id_a"), col("id_b"), col("rank_gap"))
  }
}
