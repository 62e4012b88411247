package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.{KeywordContainsExpr, KeywordMaskExpr, KeywordMatchesExpr}

/** Multi-pattern keyword curation — the blocklist/taglist stage of a
  * web-corpus pipeline (C4's badword filter, Gopher's topic lists).
  *
  * All matching goes through ONE Aho–Corasick pass per document
  * ([[graft.functions.AhoCorasick]]): cost is O(|text| + matches) no
  * matter how many patterns the list holds, vs O(|text| × P) for the
  * per-pattern `contains` rescan. The automaton is built once
  * driver-side from the (blocklist-cardinality) pattern list and rides
  * the task binary — no join, no shuffle; every operator here is a
  * narrow map over the corpus. Match semantics are exactly
  * `contains(lower(text), pattern)` per pattern, so results are
  * oracle-checkable (q_keyword_tag / q_keyword_filter /
  * q_keyword_profile).
  */
object Keywords {

  /** Distinct patterns found in `text`, lexicographically sorted.
    * Null text → null. */
  def keywordMatches(
      text: Column,
      patterns: Seq[String],
      caseInsensitive: Boolean = true): Column =
    ColumnBridge(KeywordMatchesExpr(
      ColumnBridge.expression(text), patterns, caseInsensitive))

  /** True iff any pattern occurs in `text` (early-exit scan).
    * Null text → null. */
  def containsAnyKeyword(
      text: Column,
      patterns: Seq[String],
      caseInsensitive: Boolean = true): Column =
    ColumnBridge(KeywordContainsExpr(
      ColumnBridge.expression(text), patterns, caseInsensitive))

  /** Replace every leftmost-longest non-overlapping pattern occurrence
    * with `replacement` — dictionary masking (badword masking, term
    * normalisation) in one automaton pass. Exactly the semantics of
    * `regexp_replace(text, '(p1|p2|…)', replacement, 'g')` with the
    * alternation branches sorted longest-first; patterns are literal,
    * never regex. Null text → null. */
  def maskKeywords(
      text: Column,
      patterns: Seq[String],
      replacement: String = "<MASK>",
      caseInsensitive: Boolean = true): Column =
    ColumnBridge(KeywordMaskExpr(
      ColumnBridge.expression(text), patterns, caseInsensitive, replacement))

  /** Tag every row with the sorted distinct patterns its text
    * contains (`outCol`, array&lt;string&gt;; null text → empty array). */
  def tagKeywords(
      df: DataFrame,
      textCol: String,
      patterns: Seq[String],
      outCol: String = "matched",
      caseInsensitive: Boolean = true): DataFrame =
    df.withColumn(outCol,
      coalesce(keywordMatches(col(textCol), patterns, caseInsensitive),
        array().cast("array<string>")))

  /** Keep only rows whose text contains NO blocklisted pattern. Null
    * text matches nothing and survives — the same rows
    * `NOT EXISTS (… contains(lower(text), w))` keeps. */
  def filterBlockedKeywords(
      df: DataFrame,
      textCol: String,
      blocklist: Seq[String],
      caseInsensitive: Boolean = true): DataFrame =
    df.where(!coalesce(
      containsAnyKeyword(col(textCol), blocklist, caseInsensitive),
      lit(false)))

  /** Per-pattern document frequency: (pattern, n_docs) for EVERY
    * pattern in the list, zero-matched patterns included. One narrow
    * tag pass, then an exchange at PATTERN cardinality (each document
    * contributes each pattern at most once — the tag is distinct), so
    * the aggregation is blocklist-sized regardless of corpus size. */
  def keywordProfile(
      df: DataFrame,
      textCol: String,
      patterns: Seq[String],
      caseInsensitive: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pats = patterns.distinct.sorted
    val counts = df
      .select(explode(keywordMatches(col(textCol), pats, caseInsensitive))
        .as("pattern"))
      .groupBy("pattern")
      .agg(count(lit(1)).as("n_docs"))
    pats.toDF("pattern")
      .join(counts, Seq("pattern"), "left")
      .select(col("pattern"), coalesce(col("n_docs"), lit(0L)).as("n_docs"))
  }
}
