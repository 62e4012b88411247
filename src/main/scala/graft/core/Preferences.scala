package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Preference-pair (RLHF / reward-model) data hygiene — the checks a
  * (prompt, chosen, rejected) dataset needs before reward training:
  * length-bias audit (RMs notoriously learn "longer = better" when the
  * chosen side is systematically longer — public finding across the
  * RLHF literature), prompt-grain dedup, and prompt leakage across
  * train/eval splits (a shared prompt leaks preference signal even
  * when the responses differ).
  *
  * All operators are thin compositions of the library's primitives —
  * narrow token counting (codegen'd), hash-window dedup, and
  * fingerprint-grain aggregation — so every one is exactly
  * SQL-replayable and inherits the underlying scale shapes.
  */
object Preferences {

  /** Per-pair length comparison plus the dataset-level bias audit:
    * one row per pair with token counts and the delta, for
    * downstream filtering; aggregate with [[lengthBiasSummary]]. */
  def pairLengths(
      pairs: DataFrame,
      idCol: String,
      chosenCol: String,
      rejectedCol: String): DataFrame =
    pairs.select(col(idCol),
      TextFunctions.tokenCount(col(chosenCol)).cast("long").as("chosen_tokens"),
      TextFunctions.tokenCount(col(rejectedCol)).cast("long").as("rejected_tokens"))
      .withColumn("len_delta", col("chosen_tokens") - col("rejected_tokens"))

  /** The one-row length-bias report: pair count, fraction of pairs
    * whose chosen side is strictly longer, and the mean token delta
    * (6 dp). A healthy dataset sits near 0.5 / 0; a strongly positive
    * pair is a reward-hacking risk flag. One global aggregate. */
  def lengthBiasSummary(
      pairs: DataFrame,
      idCol: String,
      chosenCol: String,
      rejectedCol: String): DataFrame =
    pairLengths(pairs, idCol, chosenCol, rejectedCol).agg(
      count(lit(1)).as("n_pairs"),
      round(avg(when(col("len_delta") > 0, 1.0).otherwise(0.0)), 6)
        .as("frac_chosen_longer"),
      round(avg(col("len_delta").cast("double")), 6).as("mean_len_delta"))

  /** Prompt-grain exact dedup: keep the minimum-id pair per normalised
    * prompt — duplicated prompts over-weight their preference signal
    * and leak between epochs. Same hash-window exchange as
    * [[graft.dedup.Dedup.exactDedup]]. */
  def dedupByPrompt(
      pairs: DataFrame,
      promptCol: String,
      idCol: String): DataFrame =
    graft.dedup.Dedup.exactDedup(pairs, promptCol, idCol)

  /** Prompt leakage across splits: one row per normalised prompt that
    * appears in MORE than one split, with the split count and pair
    * count — the audit that catches preference signal shared between
    * train and eval. Exchange at prompt-fingerprint grain (two
    * map-side-combinable aggregates). */
  def promptLeakageAcrossSplits(
      pairs: DataFrame,
      promptCol: String,
      splitCol: String): DataFrame =
    pairs.select(
        TextFunctions.fingerprint(col(promptCol)).as("prompt_fp"),
        col(splitCol).as("split"))
      .groupBy("prompt_fp")
      .agg(countDistinct(col("split")).as("n_splits"),
        count(lit(1)).as("n_pairs"))
      .filter(col("n_splits") > 1)
}
