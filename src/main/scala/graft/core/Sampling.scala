package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus sampling / mixing for training-data pipelines.
  *
  * The workhorse is HASH-based (not RNG-based) sampling: membership is
  * a pure function of the row key, so the sample is reproducible
  * across runs, engines, partitionings and cluster sizes — the
  * property a 100 TB pipeline needs for resumable / auditable corpus
  * construction (an RNG sample changes whenever partitioning does).
  * Implementation: keep a row iff the first 8 hex digits of
  * md5(salt ‖ key) fall below floor(fraction · 2³²) — md5 hex compares
  * lexicographically in value order, and md5 is available in every
  * engine, so the predicate is directly oracle-checkable.
  */
object Sampling {

  private def hexThreshold(fraction: Double): String =
    f"${math.floor(fraction * 4294967296.0).toLong}%08x"

  /** Deterministic sample of `fraction` of rows, keyed on `keyCol`.
    * Same (key, salt, fraction) → same decision everywhere. Distinct
    * salts draw independent samples. */
  def deterministicSample(
      df: DataFrame,
      keyCol: String,
      fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"deterministicSample: fraction must be in [0, 1], got $fraction")
    if (fraction >= 1.0) df
    else df.filter(
      substring(md5(concat(lit(salt), col(keyCol).cast("string"))), 1, 8)
        < lit(hexThreshold(fraction)))
  }

  /** Deterministic weighted corpus mix: each source is sampled at its
    * fraction (hash-keyed on `keyCol`, salted per source name so the
    * draws are independent) and tagged with a `source` column, then
    * unioned. The standard dataset-mixing shape for assembling a
    * training corpus from weighted slices. Source schemas must align
    * (unionByName). */
  def mixCorpora(
      sources: Seq[(String, DataFrame, Double)],
      keyCol: String,
      salt: String = ""): DataFrame = {
    require(sources.nonEmpty, "mixCorpora: need at least one source")
    sources.map { case (name, df, fraction) =>
      deterministicSample(df, keyCol, fraction, salt + name)
        .withColumn("source", lit(name))
    }.reduce(_.unionByName(_))
  }

  /** RNG-based stratified sample (thin wrapper over sampleBy) for
    * parity with per-stratum sampling APIs; prefer
    * [[deterministicSample]] per stratum when reproducibility across
    * engines/partitionings matters. */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      fractions: Map[Any, Double],
      seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)
}
