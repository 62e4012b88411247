package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Ids

/** EXACT global quantiles at 100 TB scale — and the quality gate built
  * on them ("keep the top 10 % by score").
  *
  * [[Aggregations.percentiles]]' exact mode uses Spark's `percentile`
  * aggregate, which buffers every value of a group in one aggregation
  * buffer — correct, and the right tool at group grain, but a
  * corpus-sized global quantile cannot hold the corpus in one buffer
  * (the approx sketch is the usual fallback, trading exactness). This
  * operator gets EXACTNESS scale-safely instead: range-repartition on
  * the value (the only corpus-wide movement — the same exchange any
  * global sort needs), parallel local sorts, partition-offset rank
  * arithmetic ([[graft.operators.Ids]]), then pick the value at rank
  * ⌊q·(n−1)⌋ (type-1 / lower-value semantics, no interpolation). Only
  * the VALUE column rides the exchange (the frame is projected first),
  * and results come back as a DataFrame so thresholds compose in-plan
  * (broadcast 1-row frame) with no driver collect.
  *
  * Determinism under ties: duplicate values may receive their ranks in
  * any order, but the VALUE at any given rank is unique regardless —
  * quantiles are well-defined without a tiebreak column.
  */
object Quantiles {

  /** `(q, value)` — one row per requested quantile of `valueCol`
    * (nulls excluded; `value` is double). Empty input → empty. */
  def exactQuantiles(
      df: DataFrame,
      valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "exactQuantiles: need at least one quantile")
    require(qs.forall(q => q >= 0.0 && q <= 1.0),
      s"exactQuantiles: quantiles must be in [0, 1], got $qs")
    val spark = df.sparkSession
    import spark.implicits._
    val ranked = Ids.assignContiguousIds(
      df.select(col(valueCol).cast("double").as("__graft_qv"))
        .filter(col("__graft_qv").isNotNull),
      Seq("__graft_qv"), "__graft_qr")
      .localCheckpoint(true) // two consumers: the count and the rank join
    val n = ranked.agg(count(lit(1)).as("__graft_qn"))
    qs.toDF("q")
      .crossJoin(broadcast(n))
      .withColumn("__graft_qt",
        least(floor(col("q") * (col("__graft_qn") - 1)),
          col("__graft_qn") - 1).cast("long"))
      .join(ranked, col("__graft_qt") === col("__graft_qr"))
      .select(col("q"), col("__graft_qv").as("value"))
  }

  /** Keep the rows of `df` whose `scoreCol` is at or above the exact
    * `q`-quantile of `scoreCol` — the "top (1−q) fraction by score"
    * curation gate, threshold derived in-plan and broadcast (no
    * collect). Null scores never pass. */
  def quantileGate(
      df: DataFrame,
      scoreCol: String,
      q: Double): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"quantileGate: q must be in [0, 1], got $q")
    val thr = exactQuantiles(df, scoreCol, Seq(q))
      .select(col("value").as("__graft_thr"))
    df.crossJoin(broadcast(thr))
      .filter(col(scoreCol).cast("double") >= col("__graft_thr"))
      .drop("__graft_thr")
  }
}
