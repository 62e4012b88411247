package graft

import org.apache.spark.sql.types._

/** Schema contract over the driver-generated test tables. The r10
  * regression was a silent testdata regeneration: `events.ts` changed
  * physical type and five declared queries vanished from the
  * correctness artifact before anything in-repo noticed. EventTsSpec
  * pins the ts conversion itself; THIS spec pins the rest of the
  * surface the query harness assumes — if the next regeneration drops
  * or retypes a column a query family reads, the failure starts here,
  * named, instead of as an absent correctness row.
  *
  * Assertions are deliberately tolerant of benign drift: integral
  * columns may widen/narrow (queries cast), string stays string,
  * floating stays floating — only the shape a cast can't absorb fails.
  */
class TestdataContractSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def schemaOf(table: String): StructType =
    spark.read.parquet(s"$sfDir/$table.parquet").schema

  private def isIntegral(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
    case _ => false
  }
  private def isFloating(dt: DataType): Boolean = dt match {
    case _: FloatType | _: DoubleType => true
    case _ => false
  }

  private def check(table: String, expect: (String, DataType => Boolean)*): Unit = {
    val schema = schemaOf(table)
    expect.foreach { case (name, ok) =>
      val field = schema.fields.find(_.name == name)
      assert(field.isDefined, s"$table: column `$name` missing (has: " +
        s"${schema.fieldNames.mkString(", ")})")
      assert(ok(field.get.dataType),
        s"$table.$name: incompatible type ${field.get.dataType.catalogString}")
    }
  }

  test("documents carries the text-pipeline surface") {
    check("documents",
      "doc_id" -> isIntegral, "text" -> (_ == StringType),
      "lang" -> (_ == StringType), "source" -> (_ == StringType),
      "n_chars" -> isIntegral)
  }

  test("embeddings carries the similarity/ANN surface") {
    val ok: DataType => Boolean = {
      case ArrayType(et, _) => isFloating(et)
      case _ => false
    }
    check("embeddings",
      "vec_id" -> isIntegral, "embedding" -> ok, "label" -> isIntegral)
  }

  test("events carries the streaming surface and ts normalises") {
    check("events",
      "event_id" -> isIntegral, "user_id" -> isIntegral,
      "event_type" -> (_ == StringType), "value" -> isFloating,
      "props" -> (_ == StringType))
    // any of the three physical ts shapes must normalise to TimestampType
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try {
      val normalised = graft.core.DataFrameOps.normalizeEventTs(
        spark.read.parquet(s"$sfDir/events.parquet"))
      assert(normalised.schema("ts").dataType == TimestampType)
      assert(normalised.limit(1).count() == 1, "events must be readable")
    } finally spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
  }

  test("TPC-H tables carry the join/agg key surface") {
    check("lineitem",
      "l_orderkey" -> isIntegral, "l_linenumber" -> isIntegral,
      "l_quantity" -> isFloating, "l_extendedprice" -> isFloating,
      "l_discount" -> isFloating, "l_tax" -> isFloating,
      "l_returnflag" -> (_ == StringType), "l_linestatus" -> (_ == StringType),
      "l_shipdate" -> (_ => true)) // date-ish: queries compare via casts
    check("orders",
      "o_orderkey" -> isIntegral, "o_custkey" -> isIntegral,
      "o_totalprice" -> isFloating, "o_orderstatus" -> (_ == StringType),
      "o_orderdate" -> (_ => true))
    check("customer",
      "c_custkey" -> isIntegral, "c_name" -> (_ == StringType),
      "c_nationkey" -> isIntegral, "c_acctbal" -> isFloating,
      "c_mktsegment" -> (_ == StringType))
    check("supplier", "s_suppkey" -> isIntegral, "s_nationkey" -> isIntegral)
    check("part", "p_partkey" -> isIntegral)
    check("nation",
      "n_nationkey" -> isIntegral, "n_regionkey" -> isIntegral,
      "n_name" -> (_ == StringType))
    check("region",
      "r_regionkey" -> isIntegral, "r_name" -> (_ == StringType))
  }
}
