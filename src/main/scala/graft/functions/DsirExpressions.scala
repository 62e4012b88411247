package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed-n-gram kernels for DSIR importance weighting (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling" — public methodology): documents are featurised as
  * hashed unigram+bigram counts over a FIXED bucket count, so the
  * feature domain stays bounded regardless of vocabulary and the
  * bucket log-ratio table rides the task binary as one double array.
  *
  * Both kernels tokenize exactly like `TextFunctions.normTokens`
  * (trim → lowercase → split on whitespace) and emit unigrams plus
  * adjacent-pair bigrams ("a b"). Bucketing is Scala MurmurHash3 over
  * the gram string, floor-mod the bucket count — deterministic across
  * JVMs; self-consistent between [[DsirKernels.buckets]] (distribution
  * building) and [[DsirKernels.score]] (the one-pass scorer), which is
  * the property that matters (the hash is NOT engine-portable, so the
  * hashed path is contract-tested against the word-grain exact path
  * rather than oracle-replayed).
  */
object DsirKernels {

  /** Bucket of one gram under `numBuckets`. Exposed for the spec's
    * injectivity check on fixture vocabularies. */
  def bucketOf(gram: String, numBuckets: Int): Int =
    java.lang.Math.floorMod(scala.util.hashing.MurmurHash3.stringHash(gram), numBuckets)

  private def grams(text: UTF8String): Array[String] = {
    // Locale.ROOT: the exact DSIR path lowercases via Spark's
    // locale-independent lower(); a locale-sensitive toLowerCase (e.g.
    // Turkish dotless-i) would break the "tokenize exactly like
    // normTokens" contract
    val s = text.toString.trim.toLowerCase(java.util.Locale.ROOT)
    if (s.isEmpty) return Array.empty
    val toks = s.split("\\s+")
    val out = new Array[String](toks.length + math.max(0, toks.length - 1))
    var i = 0
    while (i < toks.length) { out(i) = toks(i); i += 1 }
    var j = 0
    while (j < toks.length - 1) {
      out(toks.length + j) = toks(j) + " " + toks(j + 1)
      j += 1
    }
    out
  }

  /** One bucket id per gram OCCURRENCE (unigrams then bigrams). */
  def buckets(text: UTF8String, numBuckets: Int): ArrayData = {
    val gs = grams(text)
    val out = new Array[Any](gs.length)
    var i = 0
    while (i < gs.length) { out(i) = bucketOf(gs(i), numBuckets); i += 1 }
    new GenericArrayData(out)
  }

  /** Σ over gram occurrences of `ratios(bucket)` — the document's
    * log importance weight under a trained bucket log-ratio table.
    * Empty text → 0. */
  def score(text: UTF8String, ratios: Array[Double]): Double = {
    val gs = grams(text)
    var s = 0.0
    var i = 0
    while (i < gs.length) { s += ratios(bucketOf(gs(i), ratios.length)); i += 1 }
    s
  }
}

/** string → array&lt;int&gt; of hashed-gram buckets (see
  * [[DsirKernels.buckets]]). */
case class DsirBucketsExpr(child: Expression, numBuckets: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "dsir_buckets"

  override def nullSafeEval(input: Any): Any =
    DsirKernels.buckets(input.asInstanceOf[UTF8String], numBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DsirKernels.buckets($c, $numBuckets)")

  override protected def withNewChildInternal(newChild: Expression): DsirBucketsExpr =
    copy(child = newChild)
}

/** string → double DSIR log importance weight (see
  * [[DsirKernels.score]]); the bucket log-ratio table rides the task
  * binary by `addReferenceObj` — one narrow codegen'd pass, no
  * explode, no join, no shuffle. */
case class DsirScoreExpr(child: Expression, ratios: Array[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dsir_score"

  override def nullSafeEval(input: Any): Any =
    DsirKernels.score(input.asInstanceOf[UTF8String], ratios)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rRef = ctx.addReferenceObj("dsirRatios", ratios, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.DsirKernels.score($c, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirScoreExpr =
    copy(child = newChild)
}
