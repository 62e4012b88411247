package graft.operators

import graft.SparkTestBase
import java.sql.Timestamp

class TimeSeriesRollingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(epochSec: Long) = new Timestamp(epochSec * 1000L)

  test("rollingAgg counts and sums over the trailing inclusive range") {
    val df = Seq(
      ("a", 1L, ts(0L), 1.0), ("a", 2L, ts(5L), 2.0),
      ("a", 3L, ts(10L), 4.0), ("a", 4L, ts(21L), 8.0),
      ("b", 5L, ts(5L), 100.0)
    ).toDF("k", "id", "t", "v")
    val out = TimeSeries.rollingAgg(df, "k", "t", "v", windowSec = 10L, extraCols = Seq("id"))
      .collect().map(r => r.getLong(1) -> ((r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((1L, 1.0)))   // [−10, 0]: itself
    assert(out(2L) == ((2L, 3.0)))   // [−5, 5]: events at 0, 5
    assert(out(3L) == ((3L, 7.0)))   // [0, 10]: events at 0, 5, 10
    assert(out(4L) == ((1L, 8.0)))   // [11, 21]: itself only
    assert(out(5L) == ((1L, 100.0))) // other key isolated
  }

  test("rollingAgg: simultaneous events share a frame") {
    val df = Seq(
      ("a", 1L, ts(7L), 1.0), ("a", 2L, ts(7L), 2.0)
    ).toDF("k", "id", "t", "v")
    val out = TimeSeries.rollingAgg(df, "k", "t", "v", windowSec = 3L, extraCols = Seq("id"))
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    assert(out(1L) == 3.0 && out(2L) == 3.0)
  }

  test("sessionize assigns 0-based gap sessions per key") {
    val df = Seq(
      ("a", 1L, ts(0L)), ("a", 2L, ts(10L)), ("a", 3L, ts(100L)), ("a", 4L, ts(105L)),
      ("b", 5L, ts(3L))
    ).toDF("k", "id", "t")
    val out = TimeSeries.sessionize(df, "k", "t", gapSec = 30L, orderCols = Seq("t", "id"))
      .select("id", "session_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L))
    // leaders are exactly the first event of each session
    val leaders = TimeSeries.sessionLeaders(df, "k", "t", gapSec = 30L,
      orderCols = Seq("t", "id")).select("id").as[Long].collect().toSet
    assert(leaders == Set(1L, 3L, 5L))
  }

  test("sessionLeaders keeps burst openers only") {
    val df = Seq(
      ("a", 1L, ts(0L)), ("a", 2L, ts(10L)), ("a", 3L, ts(100L)), ("a", 4L, ts(105L)),
      ("b", 5L, ts(3L))
    ).toDF("k", "id", "t")
    val out = TimeSeries.sessionLeaders(df, "k", "t", gapSec = 30L, orderCols = Seq("t", "id"))
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 3L, 5L))
  }
}
