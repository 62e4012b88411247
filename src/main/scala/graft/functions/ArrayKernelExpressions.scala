package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass array kernels replacing interpreted higher-order
  * expressions on hot per-row paths (r19 optimization round — the
  * [[ConvKernels]] / [[HashKernels]] move applied to the remaining
  * CodegenFallback HOFs that measure on the bench):
  *
  *  - [[ngramFeatures]]: unigrams ++ adjacent bigrams from a token
  *    array — the DSIR word-grain featuriser ran
  *    `transform(sequence(...), i => concat(element_at, element_at))`
  *    interpreted, three corpus passes per importanceWeights call;
  *  - [[topTokenCount]]: max token multiplicity — the HOF form
  *    (`aggregate(array_distinct(toks), greatest(acc,
  *    size(filter(toks, _ === t))))`) is QUADRATIC in distinct tokens
  *    and interpreted;
  *  - [[prefixSum]]: the reference cumulative_array fold — per
  *    element i the HOF re-folds `slice(arr, 1, i)` from scratch
  *    (quadratic), and every add is an interpreted lambda step.
  *
  * Each kernel is byte-identical to the HOF it replaces (parity
  * specs pin it), including null propagation.
  */
object ArrayKernels {

  /** Unigrams then adjacent-pair bigrams ("a b"), exactly
    * `concat(toks, transform(sequence(1, n-1), i =>
    * concat(element_at(toks, i), " ", element_at(toks, i+1))))` with
    * the `size < 2 → no bigrams` guard: a bigram whose either token
    * is NULL is a NULL element (concat's null-propagation); null
    * unigram elements pass through. */
  def ngramFeatures(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val nBi = if (n < 2) 0 else n - 1
    val out = new Array[Any](n + nBi)
    var i = 0
    while (i < n) {
      out(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    var j = 0
    while (j < nBi) {
      out(n + j) =
        if (toks.isNullAt(j) || toks.isNullAt(j + 1)) null
        else UTF8String.concat(toks.getUTF8String(j),
          ArrayKernels.SPACE, toks.getUTF8String(j + 1))
      j += 1
    }
    new GenericArrayData(out)
  }

  private val SPACE = UTF8String.fromString(" ")

  /** Max multiplicity over the array's non-null tokens (0 when none)
    * — equal to `aggregate(array_distinct(toks), 0, (acc, t) =>
    * greatest(acc, size(filter(toks, x => x === t))))`: a null
    * distinct entry contributes size(filter(x === null)) = 0, and
    * null elements never compare equal to anything. */
  def topTokenCount(toks: ArrayData): Int = {
    val n = toks.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[UTF8String, Integer]()
    var best = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val c = counts.merge(toks.getUTF8String(i), 1, (a, b) => a + b)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }

  /** Σx² over an array&lt;double&gt;, exactly
    * `aggregate(v, 0D, (a, x) => a + x * x)`: same left-to-right IEEE
    * order; a null element nulls the fold (null accumulator
    * propagates), hence the boxed return. */
  def sumSquares(arr: ArrayData): java.lang.Double = {
    val n = arr.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val x = arr.getDouble(i)
      s += x * x
      i += 1
    }
    s
  }

  /** Running sum, exactly `transform(arr, (x, i) =>
    * aggregate(slice(arr, 1, i), 0D, (acc, y) => acc + y) + x)` over
    * an array&lt;double&gt;: out(i) replays the identical
    * left-to-right IEEE add sequence (prefix through i−1, then +x),
    * so results are bit-identical; a null element nulls its own slot
    * and poisons every later prefix, exactly like the fold. */
  def prefixSum(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var prefix: java.lang.Double = 0.0
    var i = 0
    while (i < n) {
      val x: java.lang.Double =
        if (arr.isNullAt(i)) null else arr.getDouble(i)
      val o: java.lang.Double =
        if (prefix == null || x == null) null else prefix + x
      out(i) = o
      prefix = o // prefix_{i+1} = prefix_i + x_i = out_i (same fold)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** array&lt;double&gt; → double Σx² (see [[ArrayKernels.sumSquares]]). */
case class SumSquaresExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sum_squares"
  override def nullSafeEval(input: Any): Any =
    ArrayKernels.sumSquares(input.asInstanceOf[ArrayData])
  // a null ELEMENT nulls the fold (like `aggregate(v, 0D, a + x*x)`),
  // so the kernel returns a boxed Double and the generated code
  // re-checks it — defineCodeGen would unbox null
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("graftSumSq")
      s"""
      java.lang.Double $r = graft.functions.ArrayKernels.sumSquares($c);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r.doubleValue(); }
      """
    })
  override protected def withNewChildInternal(newChild: Expression): SumSquaresExpr =
    copy(child = newChild)
}

/** array&lt;string&gt; tokens → unigrams ++ bigrams (see
  * [[ArrayKernels.ngramFeatures]]). */
case class NgramFeaturesExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "ngram_features"
  override def nullSafeEval(input: Any): Any =
    ArrayKernels.ngramFeatures(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ArrayKernels.ngramFeatures($c)")
  override protected def withNewChildInternal(newChild: Expression): NgramFeaturesExpr =
    copy(child = newChild)
}

/** array&lt;string&gt; tokens → int max token multiplicity (see
  * [[ArrayKernels.topTokenCount]]). */
case class TopTokenCountExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "top_token_count"
  override def nullSafeEval(input: Any): Any =
    ArrayKernels.topTokenCount(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ArrayKernels.topTokenCount($c)")
  override protected def withNewChildInternal(newChild: Expression): TopTokenCountExpr =
    copy(child = newChild)
}

/** array&lt;double&gt; → array&lt;double&gt; running sum (see
  * [[ArrayKernels.prefixSum]]). */
case class PrefixSumExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "prefix_sum"
  override def nullSafeEval(input: Any): Any =
    ArrayKernels.prefixSum(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ArrayKernels.prefixSum($c)")
  override protected def withNewChildInternal(newChild: Expression): PrefixSumExpr =
    copy(child = newChild)
}
