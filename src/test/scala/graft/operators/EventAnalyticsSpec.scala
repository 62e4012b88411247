package graft.operators

import graft.SparkTestBase
import java.sql.Timestamp

class EventAnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(epochSec: Long) = new Timestamp(epochSec * 1000L)

  test("transitionMatrix counts ordered pairs and row-normalises") {
    val df = Seq(
      (1L, ts(1L), "a"), (1L, ts(2L), "b"), (1L, ts(3L), "a"),
      (2L, ts(1L), "a"), (2L, ts(2L), "b")
    ).toDF("u", "t", "s")
    val out = EventAnalytics.transitionMatrix(df, "u", "s", Seq("t"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("a", "b")) == ((2L, 1.0))) // a always goes to b
    assert(out(("b", "a")) == ((1L, 1.0)))
    assert(out.size == 2)
  }

  test("cohortRetention buckets first-seen and counts distinct actives per offset") {
    val df = Seq(
      (1L, ts(5L)), (1L, ts(15L)), (1L, ts(16L)), // cohort 0, offsets 0 and 1
      (2L, ts(12L)), (2L, ts(25L)),               // cohort 10, offsets 0 and 1
      (3L, ts(3L))                                // cohort 0, offset 0
    ).toDF("u", "t")
    val out = EventAnalytics.cohortRetention(df, "u", "t", bucketSec = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((0L, 0L)) == 2L)
    assert(out((0L, 1L)) == 1L)
    assert(out((10L, 0L)) == 1L)
    assert(out((10L, 1L)) == 1L)
    assert(out.size == 4)
  }

  test("funnel counts ordered prefix completion with strict-after anchoring") {
    val df = Seq(
      // u1 completes all three in order
      (1L, ts(1L), "s1"), (1L, ts(2L), "s2"), (1L, ts(3L), "s3"),
      // u2 has s2 before s1 -> reaches only s1
      (2L, ts(5L), "s2"), (2L, ts(6L), "s1"),
      // u3: s2 simultaneous with s1 (same second) does NOT advance
      (3L, ts(7L), "s1"), (3L, ts(7L), "s2"), (3L, ts(9L), "s2"),
      // u4 never starts
      (4L, ts(1L), "s3")
    ).toDF("u", "t", "s")
    val out = EventAnalytics.funnel(df, "u", "t", "s", Seq("s1", "s2", "s3"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out(1) == 3L) // u1, u2, u3
    assert(out(2) == 2L) // u1, u3 (via the t=9 s2)
    assert(out(3) == 1L) // u1
  }

  test("funnel rejects duplicate steps") {
    val df = Seq((1L, ts(1L), "a")).toDF("u", "t", "s")
    intercept[IllegalArgumentException] {
      EventAnalytics.funnel(df, "u", "t", "s", Seq("a", "a"))
    }
  }
}
