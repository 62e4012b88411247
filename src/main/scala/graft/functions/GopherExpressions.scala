package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass document-signal kernels for the Gopher quality gates and
  * the soft quality score (r19 optimization round): the HOF
  * formulations dispatched five interpreted higher-order expressions
  * per document (aggregate over token lengths, three regex filters,
  * a stopword filter — ArrayFilter/ArrayAggregate are
  * CodegenFallback). Each kernel reproduces the SQL semantics
  * exactly — Spark's space-only `trim`, `split(_, regex, -1)`,
  * `rlike` = regex find() — so the derived rule booleans are
  * byte-identical (QualityRulesSpec / TextFunctionsSpec pin parity).
  */
object GopherKernels {

  private val ALPHA = java.util.regex.Pattern.compile("\\p{L}")
  private val BULLET = java.util.regex.Pattern.compile("^(•|\\*|-|–)\\s")
  private val ELLIPSIS_END = java.util.regex.Pattern.compile("(\\.\\.\\.|…)$")
  private val ELLIPSIS_ANY = java.util.regex.Pattern.compile("\\.\\.\\.|…")
  private val WS = java.util.regex.Pattern.compile("\\s+")
  private val NL = java.util.regex.Pattern.compile("\n")

  /** Spark's `trim`: strip leading/trailing SPACE (0x20) only — NOT
    * Java's String.trim (which strips all <= 0x20). */
  private def sparkTrim(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** All gopherFlags rule inputs in one walk. Fields:
    * (n_tok, len_sum, n_alpha, n_stop, n_lines, n_bullet,
    * n_ellipsis_lines, n_hash, n_ellipsis_text) — counts only; the
    * rule arithmetic stays in Column land so comparisons and float
    * divisions are the exact expressions they were.
    *
    * Token rules mirror `TextFunctions.tokens`: space-trim, then
    * `split("\\s+", -1)` unless the trimmed text is empty (so
    * tab-only text still yields empty-string tokens, like the SQL).
    * Line rules mirror `filter(split(text, "\n"), len(trim(l)) > 0)`
    * with bullet/ellipsis regexes FINDING in the trimmed line.
    * n_stop counts DISTINCT stopwords present (array_intersect ∘
    * array_distinct). n_hash counts '#' chars; n_ellipsis_text counts
    * non-overlapping `\.\.\.|…` matches over the whole text. */
  def signals(text: UTF8String, stopwords: Array[String]): InternalRow = {
    val s = text.toString
    // ---- token-grain
    var nTok = 0L
    var lenSum = 0L
    var nAlpha = 0L
    val stopSeen = new Array[Boolean](stopwords.length)
    var nStop = 0L
    val trimmed = sparkTrim(s)
    if (!trimmed.isEmpty) {
      val toks = WS.split(trimmed, -1)
      nTok = toks.length.toLong
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        lenSum += t.codePointCount(0, t.length).toLong
        if (ALPHA.matcher(t).find()) nAlpha += 1
        var j = 0
        while (j < stopwords.length) {
          if (!stopSeen(j) && stopwords(j) == t) { stopSeen(j) = true; nStop += 1 }
          j += 1
        }
        i += 1
      }
    }
    // ---- line-grain
    var nLines = 0L
    var nBullet = 0L
    var nEllLines = 0L
    val rawLines = NL.split(s, -1)
    var li = 0
    while (li < rawLines.length) {
      val l = sparkTrim(rawLines(li))
      if (!l.isEmpty) {
        nLines += 1
        if (BULLET.matcher(l).find()) nBullet += 1
        if (ELLIPSIS_END.matcher(l).find()) nEllLines += 1
      }
      li += 1
    }
    // ---- text-grain
    var nHash = 0L
    var ci = 0
    while (ci < s.length) {
      if (s.charAt(ci) == '#') nHash += 1
      ci += 1
    }
    var nEllText = 0L
    val m = ELLIPSIS_ANY.matcher(s)
    while (m.find()) nEllText += 1
    new GenericInternalRow(Array[Any](nTok, lenSum, nAlpha, nStop,
      nLines, nBullet, nEllLines, nHash, nEllText))
  }

  /** Stopword OCCURRENCE count over a token array — exactly
    * `size(filter(toks, t => array_contains(stopArr, t)))`: null
    * tokens never match (array_contains yields null → dropped). */
  def stopwordCount(toks: ArrayData, stopwords: Array[UTF8String]): Int = {
    val n = toks.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var j = 0
        var hit = false
        while (!hit && j < stopwords.length) {
          if (stopwords(j).equals(t)) hit = true
          j += 1
        }
        if (hit) c += 1
      }
      i += 1
    }
    c
  }
}

/** string → struct of gopherFlags rule-input counts (see
  * [[GopherKernels.signals]]). */
case class GopherSignalsExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("len_sum", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_bullet", LongType, nullable = false),
    StructField("n_ellipsis_lines", LongType, nullable = false),
    StructField("n_hash", LongType, nullable = false),
    StructField("n_ellipsis_text", LongType, nullable = false)))

  override def prettyName: String = "gopher_signals"

  @transient private lazy val stopArr: Array[String] = stopwords.toArray

  override def nullSafeEval(input: Any): Any =
    GopherKernels.signals(input.asInstanceOf[UTF8String], stopArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gopherStopwords", stopArr,
      "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GopherKernels.signals($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherSignalsExpr =
    copy(child = newChild)
}

/** array&lt;string&gt; tokens → int stopword occurrence count (see
  * [[GopherKernels.stopwordCount]]). */
case class StopwordCountExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "stopword_count"

  @transient private lazy val stopU8: Array[UTF8String] =
    stopwords.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any =
    GopherKernels.stopwordCount(input.asInstanceOf[ArrayData], stopU8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwords", stopU8,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GopherKernels.stopwordCount($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordCountExpr =
    copy(child = newChild)
}
