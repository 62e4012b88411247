package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dense random-projection kernel (Johnson–Lindenstrauss transform —
  * public methodology): y = R·v with R a deterministic gaussian
  * matrix already scaled by 1/√outDim, flattened ROW-major so the
  * hot loop is one contiguous walk. The matrix rides the task binary
  * by `addReferenceObj` — the projection is one narrow codegen'd
  * pass, no explode, no join, no shuffle at any corpus size.
  */
object ProjKernels {

  /** rFlat has outDim·inDim entries, row k at offset k·inDim. Null
    * vector elements count 0 (the join-safe convention). */
  def project(rFlat: Array[Double], inDim: Int, v: ArrayData, isFloat: Boolean): ArrayData = {
    val outDim = rFlat.length / inDim
    val n = math.min(v.numElements(), inDim)
    val out = new Array[Any](outDim)
    var k = 0
    while (k < outDim) {
      val off = k * inDim
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) {
          val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
          s += rFlat(off + i) * x
        }
        i += 1
      }
      out(k) = s
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** array&lt;float|double&gt; → array&lt;double&gt; (outDim) via a
  * deterministic gaussian projection matrix (see [[ProjKernels]]). */
case class RandomProjectExpr(child: Expression, rFlat: Array[Double], inDim: Int)
    extends UnaryExpression {

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
        if rFlat.length % inDim == 0 && rFlat.length > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName matrix length ${rFlat.length} is not a multiple of inDim=$inDim")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "random_project"

  override def nullSafeEval(input: Any): Any =
    ProjKernels.project(rFlat, inDim, input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rRef = ctx.addReferenceObj("graftProjMatrix", rFlat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ProjKernels.project($rRef, $inDim, $c, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): RandomProjectExpr =
    copy(child = newChild)
}
