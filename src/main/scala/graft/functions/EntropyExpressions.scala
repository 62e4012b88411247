package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Information-theoretic text-quality signals — the standard cheap
  * filters for gibberish / boilerplate / binary-junk detection in a
  * web-curation pipeline: Shannon entropy of the character and token
  * distributions (low char entropy ⇒ repeated-symbol junk, low token
  * entropy ⇒ boilerplate/template text) and the DEFLATE compression
  * ratio (near-duplicate-of-itself text compresses away; random noise
  * does not — the compressibility filter of e.g. CCNet/RefinedWeb-style
  * cleaning, public methodology).
  *
  * All three are per-row scalar kernels: stateless static calls emitted
  * by `doGenCode`, so they stay inside whole-stage codegen and the scan
  * never leaves the narrow pass — the same shape as [[HashKernels]].
  * Reference behavior surface: quality/ratio heuristics in
  * rdsa-utils' text-cleaning helpers (no entropy analogue exists there;
  * this is an LLM-pipeline extension family).
  */
object TextSignalKernels {

  private def entropyBits(counts: java.util.Collection[Integer], n: Int): Double = {
    if (n == 0) return 0.0
    var h = 0.0
    val it = counts.iterator()
    val ln2 = math.log(2.0)
    while (it.hasNext) {
      val p = it.next().toDouble / n
      h -= p * (math.log(p) / ln2)
    }
    h
  }

  /** Shannon entropy (bits/symbol) of the Unicode-code-point
    * distribution of `text`; empty → 0. */
  def charEntropy(text: UTF8String): Double = {
    val s = text.toString
    if (s.isEmpty) return 0.0
    val counts = new java.util.HashMap[Integer, Integer]()
    var i = 0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1, (a, b) => a + b)
      i += Character.charCount(cp)
      n += 1
    }
    entropyBits(counts.values, n)
  }

  /** Shannon entropy (bits/token) of the whitespace-token distribution
    * of `text`; empty / all-whitespace → 0. */
  def tokenEntropy(text: UTF8String): Double = {
    val s = text.toString.trim
    if (s.isEmpty) return 0.0
    val toks = s.split("\\s+")
    val counts = new java.util.HashMap[String, Integer]()
    toks.foreach(t => counts.merge(t, 1, (a, b) => a + b))
    entropyBits(counts.values, toks.length)
  }

  /** DEFLATE(level 6, raw) output bytes / input UTF-8 bytes; empty → 1.
    * Deterministic for a fixed deflate implementation (the JDK's zlib),
    * so thresholds are reproducible within an engine but NOT portable
    * across zlib builds — consumers threshold it (see
    * `TextFunctions.deflateRatio` docs), they don't compare raw values
    * across engines. */
  def deflateRatio(text: UTF8String): Double = {
    val raw = text.getBytes
    if (raw.length == 0) return 1.0
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / raw.length
    } finally d.end()
  }
}

private[functions] sealed abstract class TextSignalExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")
  override def dataType: DataType = DoubleType
}

/** string → double Shannon char entropy (see [[TextSignalKernels]]). */
case class CharEntropyExpr(child: Expression) extends TextSignalExpr {
  override def prettyName: String = "char_entropy"
  override def nullSafeEval(input: Any): Any =
    TextSignalKernels.charEntropy(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSignalKernels.charEntropy($c)")
  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}

/** string → double Shannon token entropy (see [[TextSignalKernels]]). */
case class TokenEntropyExpr(child: Expression) extends TextSignalExpr {
  override def prettyName: String = "token_entropy"
  override def nullSafeEval(input: Any): Any =
    TextSignalKernels.tokenEntropy(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSignalKernels.tokenEntropy($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenEntropyExpr =
    copy(child = newChild)
}

/** string → double DEFLATE ratio (see [[TextSignalKernels]]). */
case class DeflateRatioExpr(child: Expression) extends TextSignalExpr {
  override def prettyName: String = "deflate_ratio"
  override def nullSafeEval(input: Any): Any =
    TextSignalKernels.deflateRatio(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSignalKernels.deflateRatio($c)")
  override protected def withNewChildInternal(newChild: Expression): DeflateRatioExpr =
    copy(child = newChild)
}
