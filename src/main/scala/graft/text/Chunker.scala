package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.normTokens

/** Context-window document chunking: split each document into
  * fixed-size overlapping token windows, preserving provenance — the
  * step that turns a raw corpus into model-ingestible passages (RAG
  * indexing, long-doc training, embedding pipelines).
  *
  * Scale shape: one narrow codegen'd projection builds the chunk
  * starts (`sequence`) and slices the token array per start — no
  * shuffle at all, no UDF; output size is input tokens × (1 +
  * overlap/stride) and each task chunks only its own partition's
  * documents. At 100 TB this pipelines with the parquet scan.
  */
object Chunker {

  /** Chunk `textCol` into windows of `chunkTokens` whitespace tokens
    * advancing by `chunkTokens − overlapTokens` per step; the last
    * window may be shorter. Documents shorter than one window emit a
    * single chunk; empty documents emit none. A window start inside
    * the previous window's overlap region is not emitted — such a
    * chunk would be a strict suffix of its predecessor (pure
    * duplicated text in RAG/training output).
    *
    * Output: (idCol, chunk_id 0-based, n_tokens, chunk_text). */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int = 256,
      overlapTokens: Int = 32): DataFrame = {
    require(chunkTokens > 0, s"chunkDocuments: chunkTokens must be positive, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"chunkDocuments: overlapTokens must be in [0, chunkTokens), got $overlapTokens")
    val stride = chunkTokens - overlapTokens
    val toks = normTokens(col(textCol))
    df
      .select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol),
        posexplode(transform(
          // end bound size−overlap: a start past it yields a strict
          // suffix of the previous chunk (duplicate text), not new content
          sequence(lit(1),
            greatest(size(col("toks")) - lit(overlapTokens), lit(1)),
            lit(stride)),
          st => slice(col("toks"), st, lit(chunkTokens)))))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        size(col("col")).cast("long").as("n_tokens"),
        concat_ws(" ", col("col")).as("chunk_text"))
  }

  /** Sentence matches of a text column — maximal runs up to and
    * including their `.`/`!`/`?` terminators (a trailing unterminated
    * run is its own sentence), trimmed, empties dropped. RE2-safe
    * pattern (no lookbehind), so the split is exactly SQL-replayable.
    * Null/empty → empty array. */
  def sentences(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(
      transform(
        regexp_extract_all(coalesce(text, lit("")),
          lit("[^.!?]*[.!?]+|[^.!?]+$"), lit(0)),
        s => trim(s)),
      s => length(s) > 0)

  /** Sentence-BOUNDARY-aligned chunking: split each document into
    * sentences, then group CONSECUTIVE sentences so each chunk's
    * whitespace-token budget stays near `maxTokens` — the RAG/indexing
    * chunker that never cuts mid-sentence (an oversize single sentence
    * becomes its own chunk rather than being split). Assignment rule
    * (exactly SQL-replayable): sentence s with exclusive running token
    * count `off` joins chunk `floor(off / maxTokens)` — the packShards
    * cumulative rule at sentence grain.
    *
    * Output: (idCol, chunk_id, n_sentences, n_tokens, chunk_text);
    * chunk_id is 0-based and MONOTONE in document order but not
    * necessarily contiguous — an oversize sentence occupies several
    * budget slots, so the next sentence's id skips past them (the
    * offset rule keeps ids deterministic either way). Scale shape:
    * one posexplode to sentence grain, one window cumsum PARTITIONED
    * BY DOCUMENT (doc-grain keys — parallel across docs, never a
    * global sort), one (doc, chunk) aggregation. */
  def chunkBySentences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Int = 256): DataFrame = {
    require(maxTokens > 0, s"chunkBySentences: maxTokens must be positive, got $maxTokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("sent_idx"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(idCol), posexplode(sentences(col(textCol)))
        .as(Seq("sent_idx", "sent")))
      .withColumn("n_tok", size(split(col("sent"), "\\s+")).cast("long"))
      .withColumn("off", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("chunk_id", floor(col("off") / maxTokens).cast("long"))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(count(lit(1)).cast("long").as("n_sentences"),
        sum(col("n_tok")).as("n_tokens"),
        // order pinned by sent_idx inside the aggregate — collect_list
        // arrival order is not a contract across exchanges
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("sent_idx"), col("sent")))),
          x => x.getField("sent"))).as("chunk_text"))
  }
}
