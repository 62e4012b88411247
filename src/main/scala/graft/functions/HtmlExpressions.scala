package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass anchor-text measurement kernel for `Html.linkDensity`
  * (r20 optimization round): the HOF formulation folded an interpreted
  * `aggregate` lambda over the extracted anchors, re-dispatching the
  * tag-strip + 6-entity-decode + whitespace-collapse regex chain
  * through CodegenFallback per anchor. This kernel runs the IDENTICAL
  * java.util.regex chain — Spark's regexp_replace/regexp_extract_all
  * are thin wrappers over the same Pattern/Matcher calls, so each
  * step is byte-identical by construction (HtmlSpec pins kernel ≡ HOF
  * over entity/malformed/unicode shapes) — in one static call inside
  * whole-stage codegen.
  */
object HtmlKernels {

  // the EXACT patterns Html.scala feeds regexp_replace /
  // regexp_extract_all (Spark compiles them with Pattern.compile and
  // flags embedded in the pattern, as here)
  private val BLOCK = java.util.regex.Pattern.compile(
    "(?s)(?i)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->")
  private val ANCHOR = java.util.regex.Pattern.compile("(?si)<a[\\s>].*?</a>")
  private val TAG = java.util.regex.Pattern.compile("(?s)<[^>]*>")
  private val WS = java.util.regex.Pattern.compile("\\s+")
  // ORDER MATTERS: amp decodes LAST so "&amp;lt;" stays "&lt;"
  // (single-level decode — Html.scala's entities order)
  private val ENTITY_P: Array[java.util.regex.Pattern] = Array(
    "&nbsp;", "&lt;", "&gt;", "&quot;", "&#39;", "&amp;")
    .map(java.util.regex.Pattern.compile)
  // none of these contain '$' or '\', so Matcher.appendReplacement
  // treats them literally — same as Spark's RegExpReplace
  private val ENTITY_R: Array[String] = Array(" ", "<", ">", "\"", "'", "&")

  /** Spark's 1-arg `trim`: strip leading/trailing SPACE (0x20) only —
    * NOT Java's String.trim (which strips all <= 0x20). */
  private def sparkTrim(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** Total visible characters inside `<a>` anchors — exactly
    * `aggregate(regexp_extract_all(block-stripped html, anchorRe), 0L,
    * (acc, a) => acc + length(trim(collapse(decode(tagstrip(a))))))`:
    * block strip, anchor scan, then per anchor tag→space, 6 entity
    * decodes in order, whitespace collapse, space-trim, code-point
    * length. Staying in String land between steps equals the SQL
    * chain's UTF8String round-trips (fromString ∘ toString is the
    * identity on the valid UTF-16 each step produces), and
    * codePointCount equals UTF8String.numChars on it. */
  def anchorChars(html: UTF8String): Long = {
    val noBlocks = BLOCK.matcher(html.toString).replaceAll("")
    val m = ANCHOR.matcher(noBlocks)
    var sum = 0L
    while (m.find()) {
      var a = TAG.matcher(m.group).replaceAll(" ")
      var e = 0
      while (e < ENTITY_P.length) {
        a = ENTITY_P(e).matcher(a).replaceAll(ENTITY_R(e))
        e += 1
      }
      a = sparkTrim(WS.matcher(a).replaceAll(" "))
      sum += a.codePointCount(0, a.length).toLong
    }
    sum
  }
}

/** html string → total visible anchor-text characters (the
  * [[graft.text.Html.linkDensity]] numerator) in one codegen'd walk —
  * see [[HtmlKernels.anchorChars]]. Null html → null (null-safe
  * unary). */
case class AnchorCharsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "anchor_chars"

  override def nullSafeEval(input: Any): Any =
    HtmlKernels.anchorChars(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlKernels.anchorChars($c)")

  override protected def withNewChildInternal(newChild: Expression): AnchorCharsExpr =
    copy(child = newChild)
}
