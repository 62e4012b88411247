package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over keyed, timestamped logs: state
  * transition matrices, cohort retention, and ordered-step funnels —
  * the product-analytics trio, each expressed as window passes + hash
  * aggregations so the plans scale with the event log, not with the
  * user count on any single node.
  *
  * Scale shape: every operator exchanges on the entity key exactly
  * once (window pass), then reduces by small aggregation keys
  * (state pairs / cohort-offset cells / step names) with map-side
  * combine. Per-entity state is O(1) per row; no driver loops, no
  * collect.
  */
object EventAnalytics {

  /** First-order state transition counts and probabilities: for each
    * consecutive (state → next state) pair per key (ordered by
    * `orderCols`, which must be unique per key), the count `n` and
    * the row-normalised probability `p = n / Σ_next n` (round 6).
    * Output: (from_state, to_state, n, p). */
  def transitionMatrix(
      df: DataFrame,
      keyCol: String,
      stateCol: String,
      orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "transitionMatrix: need at least one ordering column")
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    val pairs = df
      .withColumn("__graft_next", lead(col(stateCol), 1).over(w))
      .filter(col("__graft_next").isNotNull)
      .select(col(stateCol).as("from_state"), col("__graft_next").as("to_state"))
      .groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
    val wFrom = Window.partitionBy("from_state")
    pairs.withColumn("p",
      round(col("n").cast("double") / sum("n").over(wFrom), 6))
  }

  /** Cohort retention: bucket each entity into the cohort of its
    * FIRST event (`bucketSec`-wide buckets on epoch seconds), then
    * count distinct entities active per (cohort, offset) cell where
    * `offset` = (activity bucket − cohort bucket) / bucketSec.
    * Output: (cohort_start epoch-sec, offset, n_active). The classic
    * triangle table; cells are cohorts × offsets — tiny relative to
    * the log. */
  def cohortRetention(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      bucketSec: Long): DataFrame = {
    require(bucketSec > 0, s"cohortRetention: bucketSec must be positive, got $bucketSec")
    val bucket = (floor(unix_timestamp(col(tsCol)) / bucketSec) * bucketSec).cast("long")
    val w = Window.partitionBy(entityCol)
    df
      .select(col(entityCol), bucket.as("__graft_bucket"))
      .withColumn("cohort_start", min("__graft_bucket").over(w))
      .select(col(entityCol), col("cohort_start"),
        ((col("__graft_bucket") - col("cohort_start")) / bucketSec).cast("long").as("offset"))
      .distinct()
      .groupBy("cohort_start", "offset")
      .agg(count(lit(1)).as("n_active"))
  }

  /** Ordered-step funnel: how many entities completed each prefix of
    * `steps` IN ORDER — an entity reaches step k iff there is a
    * step-k event STRICTLY after the event that completed step k−1
    * (the greedy earliest-match semantics: step k's anchor is the
    * earliest qualifying event, equivalently min(ts | step k ∧ ts >
    * anchor k−1)).
    *
    * ONE aggregation per entity (sorted event list) + a codegen'd HOF
    * fold computing the furthest step reached — no per-step joins, no
    * UDF. Per-entity event lists live in the aggregation buffer;
    * bounded by events-per-entity, the same contract as any
    * sessionization. Timestamps compare at second granularity.
    * Output: (step 1-based, step_name, n_entities), non-increasing. */
  def funnel(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      stepCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel: need at least one step")
    require(steps.distinct.size == steps.size, "funnel: steps must be distinct")
    val nSteps = steps.size
    val stepsArr = array(steps.map(lit): _*)
    val evs = df
      .select(col(entityCol),
        struct(unix_timestamp(col(tsCol)).as("t"), col(stepCol).as("s")).as("ev"))
      .groupBy(entityCol)
      .agg(sort_array(collect_list("ev")).as("evs"))
    val zero = struct(lit(0).as("i"), lit(Long.MinValue).as("lt"))
    val reached = aggregate(col("evs"), zero,
      (acc, ev) => {
        val i = acc.getField("i")
        val advance = i < nSteps &&
          ev.getField("s") === element_at(stepsArr, least(i + 1, lit(nSteps))) &&
          ev.getField("t") > acc.getField("lt")
        when(advance,
          struct((i + 1).as("i"), ev.getField("t").as("lt"))).otherwise(acc)
      },
      acc => acc.getField("i"))
    val perEntity = evs.select(reached.as("reached"))
    val counts = perEntity.select(
      steps.indices.map(i =>
        sum(when(col("reached") >= i + 1, 1L).otherwise(0L)).as(s"n$i")): _*)
    val stepRows = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i + 1).as("step"), lit(step).as("step_name"),
        coalesce(col(s"n$i"), lit(0L)).as("n_entities"))
    }
    counts.select(explode(array(stepRows: _*)).as("r"))
      .select(col("r.step"), col("r.step_name"), col("r.n_entities"))
  }
}
