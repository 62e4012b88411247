package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}

/** Ordered adjacent-pair (bigram) construction as ONE codegen'd array
  * kernel — the narrow replacement for both plans a user writes first:
  * `zip_with(slice, slice)` is a higher-order function and HOFs are
  * CodegenFallback (interpreted per element — the measured 17.9× HOF
  * tax class, SCALE.md), and `posexplode` + `lag` window pays a
  * per-token shuffle on the document key. One pass over the token
  * array, no lambda dispatch, no shuffle; feeds
  * [[graft.text.Relevance]]'s bigram LM / PMI family. */
object BigramKernels {

  /** array<string> tokens → array<struct<prev, w>> of the n−1 ordered
    * adjacent pairs (empty for n < 2; null elements pass through). */
  def bigramPairs(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var prev = if (toks.isNullAt(0)) null else toks.getUTF8String(0)
    var i = 0
    while (i < n - 1) {
      val cur = if (toks.isNullAt(i + 1)) null else toks.getUTF8String(i + 1)
      out(i) = new GenericInternalRow(Array[Any](prev, cur))
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** array<string> → array<struct<prev, w>> (see [[BigramKernels]]). */
case class BigramPairsExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "bigram_pairs"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("prev", StringType), StructField("w", StringType))),
    containsNull = false)
  override def nullSafeEval(input: Any): Any =
    BigramKernels.bigramPairs(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigramKernels.bigramPairs($c)")
  override protected def withNewChildInternal(newChild: Expression): BigramPairsExpr =
    copy(child = newChild)
}
