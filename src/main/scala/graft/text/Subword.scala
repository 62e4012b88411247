package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.{SubwordCountExpr, SubwordTokenizeExpr}
import graft.text.TextFunctions.normTokens

/** Vocabulary-driven subword tokenisation — real token accounting for
  * budget-against-a-tokenizer pipelines (mixing by token quota,
  * packing to sequence length), one rung above the regex token count
  * in [[TextFunctions.bpeTokenCount]].
  *
  * The inference rule is WordPiece greedy longest-match
  * ([[graft.functions.SubwordMatcher]]); the vocabulary is built
  * driver-side (word-frequency cut — vocabulary-cardinality data, the
  * same bounded-driver contract as Ivf.maxTrainRows) and rides the
  * task binary, so tokenisation is one narrow codegen'd pass with no
  * join and no shuffle at any corpus size.
  */
object Subword {

  /** Word-frequency vocabulary over the NORMALISED corpus: the
    * `maxWords` most frequent words with count ≥ `minCount`, ties
    * broken by word ascending (deterministic, oracle-checkable).
    * Output: (piece, c), frequency-descending. One word-cardinality
    * aggregation; the top-N plans as TakeOrderedAndProject. */
  def buildWordVocab(
      df: DataFrame,
      textCol: String,
      maxWords: Int = 10000,
      minCount: Long = 1L): DataFrame = {
    require(maxWords > 0, s"buildWordVocab: maxWords must be > 0, got $maxWords")
    df.select(explode(normTokens(col(textCol))).as("piece"))
      .groupBy("piece").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .orderBy(col("c").desc, col("piece"))
      .limit(maxWords)
  }

  /** The character fallback pieces for `words`: every distinct
    * character as a word-initial piece AND a `##` continuation piece —
    * appended to a word vocabulary so rare words decompose instead of
    * tokenising to `unk`. */
  def charFallback(words: Seq[String]): Seq[String] = {
    val chars = words.flatMap(_.toSeq).distinct.sorted
    chars.map(_.toString) ++ chars.map(c => s"##$c")
  }

  /** Greedy subword pieces of `text` (caller normalises; pieces are
    * matched case-sensitively). Null text → null. */
  def subwordTokenize(
      text: Column,
      vocab: Seq[String],
      unk: String = "[UNK]"): Column =
    ColumnBridge(SubwordTokenizeExpr(ColumnBridge.expression(text), vocab, unk))

  /** Subword piece count of `text` without materialising the pieces.
    * Null text → null. */
  def subwordCount(
      text: Column,
      vocab: Seq[String],
      unk: String = "[UNK]"): Column =
    ColumnBridge(SubwordCountExpr(ColumnBridge.expression(text), vocab, unk))
}
