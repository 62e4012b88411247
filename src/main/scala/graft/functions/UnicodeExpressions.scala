package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
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
