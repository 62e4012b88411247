package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.normTokens

/** Cross-document EXACT substring deduplication — remove duplicated
  * spans of ≥ `k` tokens wherever they recur, keeping only the first
  * occurrence (the "deduplicating training data" span-removal op of
  * Lee et al., ACL 2022; cf. rdsa-utils' document-level dedup surface,
  * which this extends below document grain). Repeated boilerplate
  * (headers, licence blocks, templated paragraphs) recurs VERBATIM
  * across documents that are not near-duplicates as wholes — document-
  * level MinHash never sees it; this operator cuts the spans
  * themselves.
  *
  * Mechanics: every doc is cut into its k-token sliding windows; a
  * window occurring more than once corpus-wide (including within one
  * document) is a duplicated span, and every token covered by a
  * non-first duplicated window is removed. "First" is the corpus-wide
  * minimum (doc, start) of the window's occurrences, so exactly one
  * copy of every duplicated region survives and the output is a pure
  * function of the data. Documents shorter than `k` tokens have no
  * windows and pass through unchanged.
  *
  * Scale shape (the suffix-array construction of the paper is a
  * single-machine design; this is the shuffle-native equivalent for
  * window-grain exactness):
  *   1. one narrow pass explodes each doc into (window, doc, start) —
  *      corpus × tokens/doc rows of (8 B hash-key + 16 B position)
  *      after projection;
  *   2. the duplicate discovery is ONE exchange keyed on the window,
  *      map-side combined, and only windows with count > 1 survive the
  *      aggregation — output is true-duplication-sized;
  *   3. only DUPLICATED windows explode into covered token positions
  *      (bounded by dup volume × k, not corpus × k), and the removal
  *      is a left_anti join at (doc, position) grain;
  *   4. reassembly is one groupBy(doc) of kept tokens — the same
  *      exchange grain as the corpus itself.
  * The window key shuffled in step 2 is the window's TOKEN STRING, so
  * the decision is exact (no hash-collision false removals); at 100 TB
  * swap the key for xxhash64(window) to shuffle 8 B keys — the
  * documented trade (collision odds ~2⁻⁶⁴) — without touching any
  * other step.
  *
  * Output: (idCol, text_deduped, n_tokens, n_removed), text rebuilt
  * from surviving tokens in position order, single-space joined over
  * the normalised tokenisation.
  */
object SubstringDedup {

  def dedupSubstrings(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 1, s"dedupSubstrings: k must be >= 1, got $k")

    // (doc, pos, token) — the grain reassembly re-aggregates
    val toks = df
      .select(col(idCol).cast("long").as("__sd_id"),
        normTokens(col(textCol)).as("__sd_toks"))
      .filter(size(col("__sd_toks")) > 0)
    val tokRows = toks
      .select(col("__sd_id"),
        posexplode(col("__sd_toks")).as(Seq("__sd_pos", "__sd_tok")))

    // (window, doc, start): start is 1-based over 1..len−k+1
    val windows = toks
      .filter(size(col("__sd_toks")) >= k)
      .select(col("__sd_id"),
        posexplode(transform(
          sequence(lit(1), size(col("__sd_toks")) - lit(k - 1)),
          st => concat_ws(" ", slice(col("__sd_toks"), st, lit(k)))))
          .as(Seq("__sd_start0", "__sd_w")))
      .select(col("__sd_id"), (col("__sd_start0") + 1).as("__sd_start"),
        col("__sd_w"))

    // duplicated windows + their corpus-wide first occurrence; the
    // exchange keys on the window and the agg is map-side combined, so
    // unique windows (the overwhelming bulk) die in the partial agg
    val dupFirst = windows
      .groupBy("__sd_w")
      .agg(count(lit(1)).as("__sd_n"),
        min(struct(col("__sd_id"), col("__sd_start"))).as("__sd_first"))
      .filter(col("__sd_n") > 1)
      .select(col("__sd_w"),
        col("__sd_first.__sd_id").as("__sd_fid"),
        col("__sd_first.__sd_start").as("__sd_fstart"))

    // every NON-FIRST occurrence of a duplicated window → its covered
    // positions (dup-volume × k rows, not corpus × k)
    // distinct output names: tokRows and removed share lineage (both
    // derive from toks), so a by-name equality would resolve to the
    // SAME attribute and degenerate to a trivially-true predicate
    val removed = windows
      .join(dupFirst, "__sd_w")
      .filter(!(col("__sd_id") === col("__sd_fid") &&
        col("__sd_start") === col("__sd_fstart")))
      .select(col("__sd_id").as("__sd_rid"),
        explode(sequence(col("__sd_start"), col("__sd_start") + lit(k - 1)))
          .as("__sd_pos1"))
      .distinct()

    val kept = tokRows
      .join(removed,
        col("__sd_id") === col("__sd_rid") &&
          col("__sd_pos") + 1 === col("__sd_pos1"),
        "left_anti")

    val rebuilt = kept
      .groupBy("__sd_id")
      .agg(
        concat_ws(" ",
          transform(
            sort_array(collect_list(struct(col("__sd_pos"), col("__sd_tok")))),
            x => x.getField("__sd_tok"))).as("text_deduped"),
        count(lit(1)).as("__sd_kept"))

    // docs whose every token was removed drop out of `rebuilt` — keep
    // them as empty strings so the output has one row per input doc
    toks
      .select(col("__sd_id"), size(col("__sd_toks")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("__sd_id"), "left")
      .select(col("__sd_id").as(idCol),
        coalesce(col("text_deduped"), lit("")).as("text_deduped"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("__sd_kept"), lit(0L))).as("n_removed"))
  }

  /** Span-level duplication profile WITHOUT rewriting text: per doc,
    * window counts and the fraction of its k-token windows that are
    * corpus-duplicated (in any position) — the cheap diagnostic pass a
    * pipeline runs to decide whether [[dedupSubstrings]] is worth a
    * full rewrite, and the per-doc boilerplate score usable as a
    * quality filter on its own. Docs with fewer than `k` tokens report
    * zero windows. Output: (idCol, n_windows, n_dup_windows,
    * dup_fraction rounded 6 dp). */
  def substringDupProfile(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 1, s"substringDupProfile: k must be >= 1, got $k")
    val toks = df
      .select(col(idCol).cast("long").as("__sd_id"),
        normTokens(col(textCol)).as("__sd_toks"))
      .filter(size(col("__sd_toks")) > 0)
    val windows = toks
      .filter(size(col("__sd_toks")) >= k)
      .select(col("__sd_id"),
        explode(transform(
          sequence(lit(1), size(col("__sd_toks")) - lit(k - 1)),
          st => concat_ws(" ", slice(col("__sd_toks"), st, lit(k)))))
          .as("__sd_w"))
    val dupW = windows.groupBy("__sd_w")
      .agg(count(lit(1)).as("__sd_n"))
      .filter(col("__sd_n") > 1)
      .select("__sd_w")
    // left_semi keyed on the window; the dup set is true-duplication-
    // sized, so AQE broadcasts it when small and shuffles when not —
    // no forced hint (a boilerplate-heavy corpus can have a large set)
    val perDoc = windows
      .join(dupW, Seq("__sd_w"), "left_semi")
      .groupBy("__sd_id").agg(count(lit(1)).as("n_dup_windows"))
    toks
      .select(col("__sd_id"),
        greatest(size(col("__sd_toks")) - lit(k - 1), lit(0))
          .cast("long").as("n_windows"))
      .join(perDoc, Seq("__sd_id"), "left")
      .select(col("__sd_id").as(idCol), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        when(col("n_windows") === 0, 0.0)
          .otherwise(round(coalesce(col("n_dup_windows"), lit(0L)) /
            col("n_windows").cast("double"), 6)).as("dup_fraction"))
  }
}
