package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text hygiene for multilingual corpora — Spark ships no
  * Unicode-normalisation builtin, so mixed NFC/NFD crawl text defeats
  * exact dedup, fingerprinting and keyword matching (visually
  * identical strings hash differently). Two stateless kernels riding
  * whole-stage codegen like every scalar kernel here:
  *
  *  - NFC canonical composition (`java.text.Normalizer`, the
  *    standard): é-as-two-codepoints becomes é-as-one, making
  *    visually-equal strings byte-equal BEFORE any hash-keyed
  *    operator.
  *  - accent folding: NFD decomposition, strip combining marks
  *    (`\p{Mn}`), re-compose — café→cafe, the matching-key reducer
  *    for search / linkage (NOT a display transform).
  */
object UnicodeKernels {

  private val combiningMarks = "\\p{Mn}+".r

  def nfcNormalize(s: UTF8String): UTF8String = {
    val raw = s.toString
    if (Normalizer.isNormalized(raw, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(raw, Normalizer.Form.NFC))
  }

  def foldAccents(s: UTF8String): UTF8String = {
    val decomposed = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val stripped = combiningMarks.replaceAllIn(decomposed, "")
    UTF8String.fromString(Normalizer.normalize(stripped, Normalizer.Form.NFC))
  }

  /** ONE code-point pass classifying every non-whitespace character of
    * `s` into the eight major script classes of
    * `graft.text.TextFunctions.scriptClasses`. Returns
    * `[n, latin, cyrillic, han, arabic, greek, hangul, kana, digit]`
    * (code-point counts; `n` = all non-whitespace). Semantics match
    * the equivalent regex formulation exactly: "whitespace" is Java
    * regex `\s` (ASCII [ \t\n\x0B\f\r], the default non-UNICODE class
    * Spark's regexp_replace compiles), script membership is
    * `Character.UnicodeScript` (the same table Java's `\p{IsLatin}`
    * property classes consult), and "digit" is ASCII 0-9 (script
    * COMMON, so the nine classes are disjoint). One pass replaces
    * nine full regex scans per row. */
  def scriptCounts(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = new Array[Long](9)
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      val isWs = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (!isWs) {
        out(0) += 1
        if (cp >= '0' && cp <= '9') out(8) += 1
        else {
          val sc = Character.UnicodeScript.of(cp)
          if (sc == Character.UnicodeScript.LATIN) out(1) += 1
          else if (sc == Character.UnicodeScript.CYRILLIC) out(2) += 1
          else if (sc == Character.UnicodeScript.HAN) out(3) += 1
          else if (sc == Character.UnicodeScript.ARABIC) out(4) += 1
          else if (sc == Character.UnicodeScript.GREEK) out(5) += 1
          else if (sc == Character.UnicodeScript.HANGUL) out(6) += 1
          else if (sc == Character.UnicodeScript.HIRAGANA ||
            sc == Character.UnicodeScript.KATAKANA) out(7) += 1
        }
      }
    }
    new GenericArrayData(out)
  }
}

private[functions] sealed abstract class UnicodeExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
}

/** string → NFC-normalised string (see [[UnicodeKernels]]). */
case class NfcNormalizeExpr(child: Expression) extends UnicodeExpr {
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(input: Any): Any =
    UnicodeKernels.nfcNormalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeKernels.nfcNormalize($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

/** string → accent-folded string (see [[UnicodeKernels]]). */
case class FoldAccentsExpr(child: Expression) extends UnicodeExpr {
  override def prettyName: String = "fold_accents"
  override def nullSafeEval(input: Any): Any =
    UnicodeKernels.foldAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeKernels.foldAccents($c)")
  override protected def withNewChildInternal(newChild: Expression): FoldAccentsExpr =
    copy(child = newChild)
}

/** string → array<long>[9] script-class code-point counts in one pass
  * (see [[UnicodeKernels.scriptCounts]]). */
case class ScriptCountsExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "script_counts"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    UnicodeKernels.scriptCounts(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeKernels.scriptCounts($c)")
  override protected def withNewChildInternal(newChild: Expression): ScriptCountsExpr =
    copy(child = newChild)
}
