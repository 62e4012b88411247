package graft.operators

import graft.SparkTestBase
import java.sql.Timestamp

class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(epochSec: Long) = new Timestamp(epochSec * 1000L)

  test("fillGaps densifies the grid and forward-fills over gaps") {
    // key "a": events in buckets 0 and 30 (10s grid) -> gaps 10, 20
    val df = Seq(
      ("a", ts(1L), 1.0), ("a", ts(5L), 2.0), ("a", ts(31L), 4.0),
      ("b", ts(12L), 9.0)
    ).toDF("k", "t", "v")
    val out = TimeSeries.fillGaps(df, "k", "t", "v", intervalSec = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.size == 5) // a: 0,10,20,30; b: 10
    assert(out(("a", 0L)) == ((2L, 3.0, 3.0)))
    assert(out(("a", 10L)) == ((0L, 0.0, 3.0))) // gap: zero events, carried sum
    assert(out(("a", 20L)) == ((0L, 0.0, 3.0)))
    assert(out(("a", 30L)) == ((1L, 4.0, 4.0)))
    assert(out(("b", 10L)) == ((1L, 9.0, 9.0)))
  }

  test("fillGaps validates interval") {
    val df = Seq(("a", ts(0L), 1.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      TimeSeries.fillGaps(df, "k", "t", "v", intervalSec = 0L)
    }
  }
}
