package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenizer (the WordPiece inference
  * rule: Wu et al. 2016, "Google's Neural Machine Translation System")
  * over a FIXED vocabulary — the real token accounting a
  * budget-against-a-tokenizer pipeline needs, one rung above regex
  * token counting.
  *
  * The vocabulary (word-initial pieces plain, continuation pieces
  * prefixed `##`) is blocklist-cardinality: built driver-side,
  * serialised into the task binary by `addReferenceObj`, invoked from
  * generated code as a plain JVM call — same shape as [[AhoCorasick]].
  * Tokenisation is per whitespace word of the (caller-normalised)
  * text: repeatedly take the LONGEST vocab piece matching at the
  * cursor (`##`-prefixed after the first); a word with no match at
  * some cursor becomes one `unk` token — the standard WordPiece
  * contract. Deterministic, so closed-form oracles hold: a vocabulary
  * containing every corpus word tokenises each word to exactly one
  * piece; a single-character vocabulary tokenises each word to
  * `len(word)` pieces.
  */
final class SubwordMatcher(rawPieces: Array[String], val unk: String)
    extends Serializable {

  require(rawPieces.nonEmpty, "SubwordMatcher: empty vocabulary")
  require(rawPieces.forall(p => p != null && p.nonEmpty && p != "##"),
    "SubwordMatcher: null/empty piece")

  private val vocab = new java.util.HashSet[String](rawPieces.length * 2)
  rawPieces.foreach(vocab.add)
  private val maxLen: Int =
    rawPieces.map(p => if (p.startsWith("##")) p.length - 2 else p.length).max

  /** Greedy pieces of ONE word, or null if some cursor has no match
    * (caller substitutes `unk` for the whole word). */
  private def wordPieces(w: String, out: java.util.ArrayList[AnyRef]): Boolean = {
    val mark = out.size()
    var pos = 0
    var first = true
    val n = w.length
    while (pos < n) {
      var l = math.min(maxLen, n - pos)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val cand =
          if (first) w.substring(pos, pos + l)
          else "##" + w.substring(pos, pos + l)
        if (vocab.contains(cand)) hit = cand
        l -= 1
      }
      if (hit == null) {
        // rollback: the whole word becomes one unk token
        while (out.size() > mark) out.remove(out.size() - 1)
        return false
      }
      out.add(UTF8String.fromString(hit))
      pos += (if (first) hit.length else hit.length - 2)
      first = false
    }
    true
  }

  /** Flat piece array over the whitespace words of `text`. */
  def tokenize(text: UTF8String): ArrayData = {
    val out = new java.util.ArrayList[AnyRef]()
    val it = text.toString.trim
    if (it.nonEmpty) it.split("\\s+").foreach { w =>
      if (!wordPieces(w, out)) out.add(UTF8String.fromString(unk))
    }
    new GenericArrayData(out.toArray)
  }

  /** Piece count without materialising the piece array. */
  def count(text: UTF8String): Int = {
    val out = new java.util.ArrayList[AnyRef]()
    var n = 0
    val it = text.toString.trim
    if (it.nonEmpty) it.split("\\s+").foreach { w =>
      out.clear()
      n += (if (wordPieces(w, out)) out.size() else 1)
    }
    n
  }
}

/** Byte-pair-encoding inference over a TRAINED merge list (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units"): each whitespace word starts as characters and repeatedly
  * applies the applicable merge of LOWEST rank, replacing every
  * (left-to-right non-overlapping) occurrence of that pair — exactly
  * the rule the trainer used, so training-corpus words reproduce their
  * training-time segmentations. The ranked merge table is
  * merge-count-cardinality: built driver-side, serialised into the
  * task binary by `addReferenceObj`, invoked from generated code —
  * same shape as [[SubwordMatcher]]. */
final class BpeEncoder(merges: Array[(String, String)]) extends Serializable {

  require(merges.forall(m => m._1.nonEmpty && m._2.nonEmpty),
    "BpeEncoder: empty merge symbol")

  // rank by first occurrence; '\u0000' never appears in a symbol
  private val rank = new java.util.HashMap[String, Integer](merges.length * 2)
  merges.zipWithIndex.foreach { case ((l, r), i) =>
    rank.putIfAbsent(l + "\u0000" + r, i)
  }

  /** BPE pieces of ONE word (empty input → empty output). */
  def encodeWord(w: String): Array[String] = {
    if (w.isEmpty) return Array.empty
    var syms: Array[String] = w.map(_.toString).toArray
    var done = syms.length == 1 || rank.isEmpty
    while (!done) {
      var bestRank = Int.MaxValue
      var bl: String = null
      var br: String = null
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get(syms(i) + "\u0000" + syms(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bl = syms(i); br = syms(i + 1) }
        i += 1
      }
      if (bl == null) done = true
      else {
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == bl && syms(j + 1) == br) {
            out += bl + br; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
        if (syms.length == 1) done = true
      }
    }
    syms
  }

  /** Flat piece array over the whitespace words of `text`. */
  def encode(text: UTF8String): ArrayData = {
    val out = new java.util.ArrayList[AnyRef]()
    val it = text.toString.trim
    if (it.nonEmpty) it.split("\\s+").foreach { w =>
      encodeWord(w).foreach(p => out.add(UTF8String.fromString(p)))
    }
    new GenericArrayData(out.toArray)
  }

  /** Piece count without materialising the piece array. */
  def count(text: UTF8String): Int = {
    var n = 0
    val it = text.toString.trim
    if (it.nonEmpty) it.split("\\s+").foreach(w => n += encodeWord(w).length)
    n
  }
}

/** string → array&lt;string&gt; of BPE pieces (see [[BpeEncoder]]). */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val encoder = new BpeEncoder(merges.toArray)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(input: Any): Any =
    encoder.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val eRef = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[BpeEncoder].getName)
    defineCodeGen(ctx, ev, c => s"$eRef.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

/** string → int BPE piece count (see [[BpeEncoder.count]]). */
case class BpeCountExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val encoder = new BpeEncoder(merges.toArray)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_count"

  override def nullSafeEval(input: Any): Any =
    encoder.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val eRef = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[BpeEncoder].getName)
    defineCodeGen(ctx, ev, c => s"$eRef.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
}

/** string → array&lt;string&gt; of greedy subword pieces (see
  * [[SubwordMatcher.tokenize]]). */
case class SubwordTokenizeExpr(
    child: Expression,
    pieces: Seq[String],
    unk: String)
    extends UnaryExpression {

  @transient private lazy val matcher =
    new SubwordMatcher(pieces.toArray, unk)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "subword_tokenize"

  override def nullSafeEval(input: Any): Any =
    matcher.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("subwordMatcher", matcher,
      classOf[SubwordMatcher].getName)
    defineCodeGen(ctx, ev, c => s"$mRef.tokenize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordTokenizeExpr =
    copy(child = newChild)
}

/** string → int subword piece count (see [[SubwordMatcher.count]]). */
case class SubwordCountExpr(
    child: Expression,
    pieces: Seq[String],
    unk: String)
    extends UnaryExpression {

  @transient private lazy val matcher =
    new SubwordMatcher(pieces.toArray, unk)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "subword_count"

  override def nullSafeEval(input: Any): Any =
    matcher.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("subwordMatcher", matcher,
      classOf[SubwordMatcher].getName)
    defineCodeGen(ctx, ev, c => s"$mRef.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordCountExpr =
    copy(child = newChild)
}
