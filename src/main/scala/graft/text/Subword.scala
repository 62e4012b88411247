package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.{BpeCountExpr, BpeEncodeExpr, SubwordCountExpr, SubwordTokenizeExpr}
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

  /** Train a byte-pair-encoding merge list (Sennrich et al. 2016) over
    * the corpus: the classic trainer operates on the WORD-FREQUENCY
    * table, not the raw text — word forms are vocabulary-cardinality
    * under Zipf's law (~10⁵–10⁶ forms for a 10¹¹-token corpus), so the
    * ONLY corpus-scale work is one map-side-combinable word-count
    * aggregation; the iterative pair-count/merge loop then runs
    * driver-side over that bounded table (`maxWordForms` enforces the
    * bound LOUDLY, the same contract as `Ivf.maxTrainRows`). A
    * merge-per-Spark-job formulation would rescan the corpus
    * `numMerges` times for strictly worse results — frequency-weighted
    * pair counts over word forms are EXACT, not an approximation.
    *
    * Merge selection is deterministic: highest frequency-weighted pair
    * count, ties by (left, right) ascending. Each chosen pair replaces
    * its left-to-right non-overlapping occurrences — the same rule
    * [[graft.functions.BpeEncoder]] applies at inference, so training
    * words reproduce their training segmentations exactly.
    *
    * Returns the ranked merges `(left, right)`; stops early when no
    * pair remains (every surviving word fused to one symbol). */
  def trainBpeMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxWordForms: Int = 1000000,
      minCount: Long = 1L): Seq[(String, String)] = {
    require(numMerges >= 0, s"trainBpeMerges: numMerges must be >= 0")
    val forms = df.select(explode(normTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .take(maxWordForms + 1)
    require(forms.length <= maxWordForms,
      s"trainBpeMerges: corpus has more than $maxWordForms distinct word " +
        s"forms after minCount=$minCount; raise maxWordForms (driver memory " +
        "permitting) or raise minCount to keep the driver table bounded")
    var words: Array[(Array[String], Long)] = forms.map { r =>
      (r.getString(0).map(_.toString).toArray, r.getLong(1))
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.merge(p, c, (a, b) => a + b)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        var best: (String, String) = null
        var bestC = -1L
        pairCounts.forEach { (p, c) =>
          if (c > bestC || (c == bestC &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
            best = p; bestC = c
          }
        }
        merges += best
        val fused = best._1 + best._2
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
                out += fused; j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.toArray, c)
          }
        }
        m += 1
      }
    }
    merges.toSeq
  }

  /** BPE pieces of `text` under a trained merge list (caller
    * normalises). Null text → null. One narrow codegen'd pass. */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge(BpeEncodeExpr(ColumnBridge.expression(text), merges))

  /** BPE piece count of `text` without materialising the pieces —
    * the token-budget accounting column. Null text → null. */
  def bpeCount(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge(BpeCountExpr(ColumnBridge.expression(text), merges))

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

  /** Per-document vocabulary coverage against a trained word vocab —
    * the corpus-QA number a tokenizer review asks for before a
    * training run ("what fraction of tokens will hit [UNK]?"). Adds
    * `n_tok`, `n_in_vocab`, `oov_rate` (6 dp; empty docs → 0.0).
    *
    * Scale shape: the vocab side is an ARTIFACT (vocabulary-sized by
    * Zipf, bounded LOUDLY by `maxVocab`) collected once as xxhash64
    * keys; the corpus pass is ONE narrow codegen'd projection —
    * tokens hash inside a HOF, membership settles by binary search in
    * the sorted key set riding the task binary (the
    * decontaminateStream kernel) — no explode, no join, no shuffle. */
  def vocabCoverage(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vocab: DataFrame,
      pieceCol: String = "piece",
      maxVocab: Int = 4000000): DataFrame = {
    val keys = vocab.select(xxhash64(col(pieceCol)).as("h"))
      .limit(maxVocab + 1).collect().map(_.getLong(0))
    require(keys.length <= maxVocab,
      s"vocabCoverage: vocab exceeds maxVocab=$maxVocab rows — a word " +
        "vocabulary is an artifact, not a corpus; raise the bound only " +
        "with driver memory to match")
    val toks = normTokens(col(textCol))
    // codegen'd kernel — bit-identical to the interpreted HOF
    // `transform(toks, t => xxhash64(t))` (TokenHashesExpr scaladoc)
    val hashes = graft.functions.HashFunctions.tokenHashesNative(toks)
    df.select(col(idCol),
        size(toks).cast("long").as("n_tok"),
        graft.functions.BloomFunctions.sortedSetCount(hashes, keys)
          .cast("long").as("n_in_vocab"))
      .withColumn("oov_rate",
        when(col("n_tok") === 0, 0.0)
          .otherwise(round(lit(1.0) -
            col("n_in_vocab").cast("double") / col("n_tok"), 6)))
  }

  /** Persist a trained BPE merge list as `(rank, left_sym, right_sym)`
    * parquet — the tokenizer artifact: train ONCE
    * ([[trainBpeMerges]]), serve forever across sessions/jobs (the
    * `AnnIndex.save` pattern). Rank order IS the merge priority, so
    * the round trip must be bit-exact — [[loadBpeMerges]] validates
    * contiguity. */
  def saveBpeMerges(
      spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)],
      dir: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i.toLong, l, r) }
      .toDF("rank", "left_sym", "right_sym")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a merge list written by [[saveBpeMerges]], in rank order. */
  def loadBpeMerges(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(String, String)] = {
    import spark.implicits._
    val rows = spark.read.parquet(dir)
      .select($"rank".cast("long"), $"left_sym", $"right_sym")
      .as[(Long, String, String)].collect()
      .sortBy(_._1)
    require(rows.map(_._1).sameElements(rows.indices.map(_.toLong)),
      s"loadBpeMerges: ranks at $dir are not the contiguous range " +
        s"0..${rows.length - 1} — not a saveBpeMerges artifact")
    rows.map(r => (r._2, r._3)).toSeq
  }
}
