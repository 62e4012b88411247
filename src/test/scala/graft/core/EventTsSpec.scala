package graft.core

import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Contract test for [[DataFrameOps.normalizeEventTs]]: the events table
  * has shipped with THREE physical `ts` shapes across driver testdata
  * regenerations (TIMESTAMP(NANOS) → LongType nanos under the
  * nanosAsLong knob, then timestamp[us] → TimestampNTZType — the r10
  * regression — and plain TimestampType). This spec round-trips each
  * shape through parquet and pins that normalisation yields identical
  * TimestampType instants, so the NEXT regeneration cannot silently
  * kill the event-window query family again (VERDICT r10 item 6).
  */
class EventTsSpec extends SparkTestBase {

  // 2024-03-01T12:34:56.789012 UTC — a value with non-zero micros so
  // the ns→µs truncation path is actually exercised
  private val micros = Seq(1709296496789012L, 1709296500000000L, 0L)

  private def roundTrip(write: => Unit, dir: String) = {
    write
    spark.read.parquet(dir)
  }

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_evts_$name").toString + "/t"

  test("normalizeEventTs: LongType nanos, NTZ, and TimestampType parquet all converge") {
    import spark.implicits._

    // shape 1: raw int64 nanos (what nanosAsLong surfaces for TIMESTAMP(NANOS) files)
    val longDir = tmp("long")
    val longDf = roundTrip(
      micros.map(m => (1L, m * 1000L)).toDF("event_id", "ts")
        .write.parquet(longDir), longDir)
    assert(longDf.schema("ts").dataType == LongType)

    // shape 2: timestamp[us] with no timezone → TimestampNTZType (the r10 testdata)
    val ntzDir = tmp("ntz")
    val ntzDf = roundTrip(
      micros.map(m => (1L, LocalDateTime.ofEpochSecond(
          m / 1000000L, ((m % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)))
        .toDF("event_id", "ts").write.parquet(ntzDir), ntzDir)
    assert(ntzDf.schema("ts").dataType == TimestampNTZType)

    // shape 3: session-zoned TimestampType (instant semantics)
    val tsDir = tmp("ts")
    val tsDf = roundTrip(
      micros.map(m => (1L, new Timestamp(m / 1000L) match {
          case t => { t.setNanos(((m % 1000000L) * 1000L).toInt); t }
        })).toDF("event_id", "ts").write.parquet(tsDir), tsDir)
    assert(tsDf.schema("ts").dataType == TimestampType)

    val results = Seq(longDf, ntzDf, tsDf).map(DataFrameOps.normalizeEventTs(_))
    results.foreach(r => assert(r.schema("ts").dataType == TimestampType))
    // identical instants: compare as epoch micros (session TZ is UTC,
    // so the NTZ wall clock reinterprets to the same instant)
    val expected = micros.sorted
    results.foreach { r =>
      val got = r.select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq
      assert(got == expected, s"instants differ: $got vs $expected")
    }
  }

  test("normalizeEventTs throws on an unsupported ts type instead of passing junk") {
    val bad = df("event_id BIGINT, ts STRING", Seq(1L, "2024-03-01"))
    val e = intercept[IllegalArgumentException](DataFrameOps.normalizeEventTs(bad))
    assert(e.getMessage.contains("unsupported type"))
  }

  test("normalizeEventTs names the missing column") {
    val noTs = df("event_id BIGINT", Seq(1L))
    intercept[graft.ColumnNotInDataframeError](DataFrameOps.normalizeEventTs(noTs))
  }
}
