package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro and Jaro-Winkler string similarity as a native codegen'd
  * Catalyst expression — the name/title matching metric that tolerates
  * transpositions (where Levenshtein charges 2) and rewards common
  * prefixes. Semantics pinned to DuckDB's `jaro_winkler_similarity`
  * (StringSimilaritySpec carries the cross-checked reference values):
  * match window `max(len)/2 - 1`, prefix boost `p = 0.1` capped at 4
  * chars and applied only when jaro > 0.7, case-sensitive, and EITHER
  * input empty → 0.0 (including both-empty — DuckDB scores no
  * evidence as no similarity, not identity). Comparison is by UTF-16
  * code unit — identical to codepoint comparison for all of the BMP.
  *
  * Scale shape: `doGenCode` emits one static call, so the kernel sits
  * inside whole-stage codegen next to the join it filters — no UDF
  * serialization fence, no interpreted per-char expression walking.
  * O(len_a × len_b) per pair like every Jaro implementation: at corpus
  * scale it belongs ABOVE a blocking join (`Fuzzy.blockedFuzzyJoin`'s
  * prefix/length-band pattern), never on a raw cross join.
  */
object StringSimKernels {

  /** Jaro similarity in [0, 1]. */
  def jaro(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatched = new Array[Boolean](la)
    val bMatched = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bMatched(j) && a.charAt(i) == b.charAt(j)) {
          aMatched(i) = true
          bMatched(j) = true
          matches += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / la + m / lb + (m - transpositions / 2) / m) / 3.0
  }

  /** Jaro-Winkler: jaro, prefix-boosted (p = 0.1, prefix cap 4) when
    * jaro exceeds the standard 0.7 threshold. */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val j = jaro(ua, ub)
    if (j <= 0.7) return j
    val a = ua.toString
    val b = ub.toString
    val max = math.min(4, math.min(a.length, b.length))
    var l = 0
    while (l < max && a.charAt(l) == b.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }
}

/** (string, string) → double Jaro-Winkler similarity. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two string inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimKernels.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSimKernels.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

/** (string, string) → double Jaro similarity (no prefix boost). */
case class JaroExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two string inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro"

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimKernels.jaro(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSimKernels.jaro($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroExpr =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points. */
object StringSimilarity {

  /** Jaro-Winkler similarity of two string columns (native codegen). */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge(JaroWinklerExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Jaro similarity of two string columns (native codegen). */
  def jaro(a: Column, b: Column): Column =
    ColumnBridge(JaroExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
