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
}
