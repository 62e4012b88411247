package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass conversation-profile kernel — the codegen'd form of
  * `Conversations.turnProfile`'s per-row computation. The HOF
  * formulation (seven interpreted higher-order expressions per row —
  * transform/filter/aggregate/zip_with are CodegenFallback) measured
  * ~1.6 ms/row at sf0.1; one static kernel call walking the struct
  * array once brings the operator back inside whole-stage codegen,
  * the same move as [[HashKernels]] (and the interpreted formulation
  * survives as the Bench raw baseline).
  */
object ConvKernels {

  private val SYSTEM = UTF8String.fromString("system")
  private val USER = UTF8String.fromString("user")
  private val ASSISTANT = UTF8String.fromString("assistant")
  private val SPACE = UTF8String.fromString(" ")

  /** One walk over (role, content) turns → InternalRow of
    * (n_turns, n_system, n_user, n_assistant, total_tokens,
    * alternates). Null roles count toward no role bucket and compare
    * unequal to everything (they break alternation only via the
    * repeated-role rule never firing); null contents count 0 tokens.
    * `alternates` = roles strictly change at every step after the
    * first and "system" appears only at position 0. */
  def profile(
      turns: ArrayData,
      roleIdx: Int,
      contentIdx: Int,
      numFields: Int): InternalRow = {
    val n = turns.numElements()
    var nSys = 0L
    var nUser = 0L
    var nAsst = 0L
    var tokens = 0L
    var alternates = true
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      // a null struct ELEMENT is a turn with null role/content: it
      // counts toward n only (getStruct returns null, so every field
      // access must be guarded)
      val row = turns.getStruct(i, numFields)
      val role =
        if (row == null || row.isNullAt(roleIdx)) null
        else row.getUTF8String(roleIdx)
      if (role != null) {
        if (role.equals(SYSTEM)) nSys += 1
        else if (role.equals(USER)) nUser += 1
        else if (role.equals(ASSISTANT)) nAsst += 1
      }
      if (i > 0 && role != null &&
        (role.equals(SYSTEM) || (prev != null && role.equals(prev))))
        alternates = false
      if (row != null && !row.isNullAt(contentIdx)) {
        val s = row.getUTF8String(contentIdx).toString.trim
        if (s.nonEmpty) tokens += s.split("\\s+").length
      }
      prev = role
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, nSys, nUser, nAsst,
      tokens, alternates))
  }

  /** One pass building the deterministic conversation fixture's turns
    * array (the codegen'd form of
    * `Conversations.syntheticConversationTable`'s per-row transform):
    * doc tokens split into k = 2 + id%3 contiguous turns, roles
    * alternating user/assistant with a leading system turn when
    * id%4 = 0. Byte-identical to the HOF formulation
    * `transform(sequence(0, k-1), j => struct(role, concat_ws(" ",
    * slice(toks, floor(j·n/k)+1, floor((j+1)·n/k)−floor(j·n/k)))))`,
    * including its double-arithmetic turn boundaries and concat_ws's
    * null-element skipping — that formulation dispatches an
    * interpreted HOF (ArrayTransform is CodegenFallback) with a
    * per-turn slice COPY of the token array; this kernel walks the
    * tokens once inside whole-stage codegen. */
  def turns(toks: ArrayData, id: Long): ArrayData = {
    val k = 2 + java.lang.Math.floorMod(id, 3L).toInt
    val o = if (java.lang.Math.floorMod(id, 4L) == 0L) 1 else 0
    val n = toks.numElements()
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      val role =
        if (j < o) SYSTEM
        else if ((j - o) % 2 == 0) USER
        else ASSISTANT
      // slice(toks, start0+1, max(end0-start0, 0)) bounds, 0-based
      val start = math.floor(j.toDouble * n / k).toInt
      val end0 = math.floor((j + 1).toDouble * n / k).toInt
      val end = math.min(if (end0 < start) start else end0, n)
      // byte-level join: UTF8String.concatWs skips null elements like
      // concat_ws does. The previous StringBuilder/toString build was a
      // UTF-16 round-trip — tokens carrying invalid UTF-8 bytes were
      // rewritten to replacement chars, diverging from the HOF's
      // byte-level concat_ws (ADVICE r19).
      val parts = new Array[UTF8String](end - start)
      var i = start
      while (i < end) {
        parts(i - start) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
        i += 1
      }
      out(j) = new GenericInternalRow(
        Array[Any](role, UTF8String.concatWs(SPACE, parts: _*)))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** One walk over (role, content) turns → the role-tagged transcript
    * `<|role|> content` joined by `sep`. Byte-identical to the HOF
    * formulation `array_join(transform(turns, concat(...)), sep)`:
    * a turn with a null struct, null role or null content renders to
    * a null element, which array_join SKIPS (no separator
    * contribution); empty/all-null turns render "". */
  def render(
      turns: ArrayData,
      roleIdx: Int,
      contentIdx: Int,
      numFields: Int,
      sep: UTF8String): UTF8String = {
    val n = turns.numElements()
    val sb = new java.lang.StringBuilder
    val sepStr = sep.toString
    var first = true
    var i = 0
    while (i < n) {
      val row = turns.getStruct(i, numFields)
      if (row != null && !row.isNullAt(roleIdx) && !row.isNullAt(contentIdx)) {
        if (!first) sb.append(sepStr)
        sb.append("<|").append(row.getUTF8String(roleIdx).toString)
          .append("|> ").append(row.getUTF8String(contentIdx).toString)
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** (tokens array&lt;string&gt;, conv_id long) → the fixture's turns
  * array (see [[ConvKernels.turns]]). Null-safe like the HOF
  * formulation it replaces: a null conv_id nulls the array; callers
  * coalesce null token arrays to empty (identical output — every
  * turn's content renders "" either way). */
case class ConvTurnsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, bigint), got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("role", StringType, nullable = false),
    StructField("content", StringType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "conv_turns"

  override def nullSafeEval(toks: Any, id: Any): Any =
    ConvKernels.turns(toks.asInstanceOf[ArrayData], id.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, i) =>
      s"graft.functions.ConvKernels.turns($t, $i)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ConvTurnsExpr =
    copy(left = newLeft, right = newRight)
}

/** array&lt;struct&lt;role, content&gt;&gt; → struct profile (see
  * [[ConvKernels.profile]]). Resolves the role/content field indexes
  * by NAME at bind time, so struct field order is free. */
case class ConvProfileExpr(child: Expression) extends UnaryExpression {

  private def fieldIdx(name: String): Int = child.dataType match {
    case ArrayType(s: StructType, _) => s.fieldNames.indexOf(name)
    case _ => -1
  }

  private def numFields: Int = child.dataType match {
    case ArrayType(s: StructType, _) => s.fields.length
    case _ => 0
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.fieldNames.contains("role") && s.fieldNames.contains("content") &&
          s("role").dataType == StringType && s("content").dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<role: string, content: string>>, " +
        s"got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_turns", LongType, nullable = false),
    StructField("n_system", LongType, nullable = false),
    StructField("n_user", LongType, nullable = false),
    StructField("n_assistant", LongType, nullable = false),
    StructField("total_tokens", LongType, nullable = false),
    StructField("alternates", BooleanType, nullable = false)))

  override def prettyName: String = "conv_profile"

  override def nullSafeEval(input: Any): Any =
    ConvKernels.profile(input.asInstanceOf[ArrayData],
      fieldIdx("role"), fieldIdx("content"), numFields)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ConvKernels.profile($c, ${fieldIdx("role")}, " +
        s"${fieldIdx("content")}, $numFields)")

  override protected def withNewChildInternal(newChild: Expression): ConvProfileExpr =
    copy(child = newChild)
}

/** array&lt;struct&lt;role, content&gt;&gt; → role-tagged transcript
  * string (see [[ConvKernels.render]]); `sep` is a construction-time
  * constant. One codegen'd pass — the transform+concat+array_join
  * formulation dispatches three interpreted HOF levels per turn. */
case class ConvRenderExpr(child: Expression, sep: String)
    extends UnaryExpression {

  private def fieldIdx(name: String): Int = child.dataType match {
    case ArrayType(s: StructType, _) => s.fieldNames.indexOf(name)
    case _ => -1
  }

  private def numFields: Int = child.dataType match {
    case ArrayType(s: StructType, _) => s.fields.length
    case _ => 0
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.fieldNames.contains("role") && s.fieldNames.contains("content") &&
          s("role").dataType == StringType && s("content").dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<role: string, content: string>>, " +
        s"got ${other.sql}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "conv_render"

  private lazy val sepU8 = UTF8String.fromString(sep)

  override def nullSafeEval(input: Any): Any =
    ConvKernels.render(input.asInstanceOf[ArrayData],
      fieldIdx("role"), fieldIdx("content"), numFields, sepU8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("convRenderSep", sepU8)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ConvKernels.render($c, ${fieldIdx("role")}, " +
        s"${fieldIdx("content")}, $numFields, $sepRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): ConvRenderExpr =
    copy(child = newChild)
}
