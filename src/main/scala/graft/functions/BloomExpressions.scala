package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probes as native Catalyst expressions.
  *
  * Spark's own runtime bloom filters (`InjectRuntimeFilter`) only fire
  * on equi-join keys the optimizer can see; they can never probe
  * membership of elements INSIDE an array column, which is exactly the
  * shape a decontamination pass needs ("does any n-gram of this
  * document appear in the eval set?"). These expressions expose the
  * same `org.apache.spark.util.sketch.BloomFilter` machinery as
  * explicit, codegen'd column operations:
  *
  *  - [[BloomMightContainExpr]]: long -> boolean scalar probe, for
  *    key-membership prefilters ahead of semi/anti joins.
  *  - [[BloomAnyContainExpr]]: array<long> -> boolean fused loop, for
  *    "any element hits" probes without exploding the array.
  *
  * The filter rides along as serialized bytes in the expression and is
  * deserialized lazily once per task; codegen pins the deserialized
  * filter as a plan reference (the same pattern Spark's internal
  * `BloomFilterMightContain` uses), so the probe stays inside
  * whole-stage codegen.
  *
  * A bloom probe can return false positives (rate `fpp`) but never
  * false negatives — callers layering an EXACT operator on top must
  * verify positives (see [[graft.dedup.Dedup.bloomDecontaminate]] and
  * [[graft.core.DataFrameOps.bloomSemiJoin]]) and may trust negatives
  * outright.
  */
object BloomKernels {

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  def serialize(bloom: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** True iff ANY element of `arr` might be in `bloom` — a tight loop
    * with early exit, so the per-document cost on a clean corpus is a
    * handful of hash probes, not an explode + join. */
  def anyContain(bloom: BloomFilter, arr: ArrayData): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (bloom.mightContainLong(arr.getLong(i))) return true
      i += 1
    }
    false
  }

  /** EXACT membership count: how many elements of `arr` appear in the
    * sorted key array — binary search per element, no explode, no
    * join. The exact sibling of [[anyContain]] for key sets small
    * enough to ride along with the plan. */
  def sortedSetCount(keys: Array[Long], arr: ArrayData): Int = {
    val n = arr.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (java.util.Arrays.binarySearch(keys, arr.getLong(i)) >= 0) hits += 1
      i += 1
    }
    hits
  }
}

/** long -> boolean: does the key possibly belong to the filter's set? */
case class BloomMightContainExpr(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomKernels.deserialize(filterBytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a LongType key, got ${other.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}

/** array<long> -> boolean: does ANY element possibly belong? */
case class BloomAnyContainExpr(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomKernels.deserialize(filterBytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_any_contain"

  override def nullSafeEval(input: Any): Any =
    BloomKernels.anyContain(bloom, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.BloomKernels.anyContain($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomAnyContainExpr =
    copy(child = newChild)
}

/** array<long> -> int: EXACT count of elements found in a sorted key
  * set carried with the expression. With the bloom probes this
  * completes a stateless decontamination predicate: bloom rejects the
  * clean bulk cheaply, this settles the hits exactly — no explode, no
  * join, no state, which is what a STREAMING filter needs. */
case class SortedSetCountExpr(child: Expression, sortedKeys: Array[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_set_count"

  override def nullSafeEval(input: Any): Any =
    BloomKernels.sortedSetCount(sortedKeys, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSortedKeys", sortedKeys, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BloomKernels.sortedSetCount($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SortedSetCountExpr =
    copy(child = newChild)
}

/** Column-level entry points for bloom building and probing. */
object BloomFunctions {

  /** Distributed-build a bloom filter over a LongType column of `df`
    * and return it serialized. The build is a treeAggregate over the
    * column (one narrow pass, no shuffle of `df`); only the filter's
    * bits — `~1.2 * expectedItems * log2(1/fpp) / 8` bytes — come back
    * to the driver, NOT the values. A 10M-key filter at fpp=0.01 is
    * ~12 MB: broadcastable where the key set itself might not be. */
  def buildBloomBytes(
      df: DataFrame,
      colName: String,
      expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0,
      s"buildBloomBytes: expectedItems must be > 0, got $expectedItems")
    require(fpp > 0.0 && fpp < 1.0,
      s"buildBloomBytes: fpp must be in (0, 1), got $fpp")
    BloomKernels.serialize(df.stat.bloomFilter(colName, expectedItems, fpp))
  }

  /** Driver-side build from an already-materialised key array — for
    * callers that hold the key set anyway (e.g. a bounded eval-gram
    * collect): skips the extra distributed aggregate job that
    * [[buildBloomBytes]] would run. */
  def buildBloomBytesFromKeys(keys: Array[Long], fpp: Double = 0.01): Array[Byte] = {
    require(fpp > 0.0 && fpp < 1.0,
      s"buildBloomBytesFromKeys: fpp must be in (0, 1), got $fpp")
    val bf = BloomFilter.create(math.max(keys.length, 1), fpp)
    var i = 0
    while (i < keys.length) { bf.putLong(keys(i)); i += 1 }
    BloomKernels.serialize(bf)
  }

  /** Scalar probe of a LongType key column. */
  def bloomMightContain(key: Column, filterBytes: Array[Byte]): Column =
    ColumnBridge(BloomMightContainExpr(ColumnBridge.expression(key), filterBytes))

  /** Fused any-element probe of an array<long> column. */
  def bloomAnyContain(arr: Column, filterBytes: Array[Byte]): Column =
    ColumnBridge(BloomAnyContainExpr(ColumnBridge.expression(arr), filterBytes))

  /** Exact membership count of an array<long> column against a key
    * set (sorted internally — pass any order). */
  def sortedSetCount(arr: Column, keys: Array[Long]): Column = {
    val sorted = keys.clone()
    java.util.Arrays.sort(sorted)
    ColumnBridge(SortedSetCountExpr(ColumnBridge.expression(arr), sorted))
  }
}
