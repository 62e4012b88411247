package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def trades = Seq(
    ("A", ts("2024-01-01 10:00:05"), 100.0),
    ("A", ts("2024-01-01 10:00:20"), 101.0),
    ("B", ts("2024-01-01 10:00:07"), 50.0),
    ("C", ts("2024-01-01 10:00:10"), 7.0) // no quotes for C
  ).toDF("sym", "ts", "price")

  private def quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 99.5),
    ("A", ts("2024-01-01 10:00:10"), 100.5),
    ("A", ts("2024-01-01 10:00:30"), 102.0), // after every trade
    ("B", ts("2024-01-01 10:00:07"), 49.9)   // exact tie
  ).toDF("sym", "ts", "quote")

  test("asOfJoin attaches the most recent right row per key") {
    val out = AsOfJoin.asOfJoin(trades, quotes, Seq("sym"), "ts", Seq("quote"))
    val got = out.collect()
      .map(r => (r.getString(0), r.getDouble(2), Option(r.get(3)))).toSet
    assert(got == Set(
      ("A", 100.0, Some(99.5)),   // 10:00:05 → quote at 10:00:00
      ("A", 101.0, Some(100.5)),  // 10:00:20 → quote at 10:00:10
      ("B", 50.0, Some(49.9)),    // exact timestamp tie matches
      ("C", 7.0, None)))          // no quotes → null
  }

  test("asOfJoin keeps all left rows and columns") {
    val out = AsOfJoin.asOfJoin(trades, quotes, Seq("sym"), "ts", Seq("quote"))
    assert(out.count() == trades.count())
    assert(out.columns.toSeq == Seq("sym", "ts", "price", "quote"))
  }

  test("tolerance nulls stale matches") {
    val out = AsOfJoin.asOfJoin(trades, quotes, Seq("sym"), "ts", Seq("quote"),
      tolerance = Some(5L))
    val a20 = out.filter($"price" === 101.0).head()
    assert(Option(a20.get(3)).isEmpty) // quote is 10s old > 5s tolerance
    val b = out.filter($"price" === 50.0).head()
    assert(b.getDouble(3) == 49.9) // age 0 within tolerance
  }

  test("a NULL in the most recent right row is attached as-is, not backfilled") {
    // newest matching quote row carries (bid=null, ask=51.0); the older
    // row's bid=49.0 must NOT leak in — the matched row is atomic
    val quotes2 = Seq(
      ("B", ts("2024-01-01 10:00:01"), Option(49.0), Option(49.5)),
      ("B", ts("2024-01-01 10:00:05"), Option.empty[Double], Option(51.0))
    ).toDF("sym", "ts", "bid", "ask")
    val out = AsOfJoin.asOfJoin(
      trades.filter($"sym" === "B"), quotes2, Seq("sym"), "ts", Seq("bid", "ask"))
    val row = out.head()
    assert(Option(row.get(row.fieldIndex("bid"))).isEmpty,
      "bid must stay NULL (newest matched row has NULL bid)")
    assert(row.getDouble(row.fieldIndex("ask")) == 51.0)
  }

  test("forward direction attaches the earliest quote at or after the trade") {
    val out = AsOfJoin.asOfJoin(trades, quotes, Seq("sym"), "ts", Seq("quote"),
      direction = "forward")
    val got = out.collect()
      .map(r => (r.getString(0), r.getDouble(2), Option(r.get(3)))).toSet
    assert(got == Set(
      ("A", 100.0, Some(100.5)),  // 10:00:05 → next quote at 10:00:10
      ("A", 101.0, Some(102.0)),  // 10:00:20 → next quote at 10:00:30
      ("B", 50.0, Some(49.9)),    // exact tie matches forward too
      ("C", 7.0, None)))
  }

  test("nearest direction picks the closer quote, ties backward") {
    // asymmetric quotes so nearest differs from both plain directions
    val q2 = Seq(
      ("A", ts("2024-01-01 10:00:00"), 99.5),
      ("A", ts("2024-01-01 10:00:07"), 100.5), // 2s after the 10:00:05 trade
      ("A", ts("2024-01-01 10:00:21"), 102.0)) // 1s after the 10:00:20 trade
      .toDF("sym", "ts", "quote")
    val out = AsOfJoin.asOfJoin(
      trades.filter($"sym" === "A"), q2, Seq("sym"), "ts", Seq("quote"),
      direction = "nearest")
    val got = out.collect().map(r => r.getDouble(2) -> r.getDouble(3)).toMap
    assert(got == Map(
      100.0 -> 100.5, // 10:00:05: forward d=2 beats backward d=5
      101.0 -> 102.0)) // 10:00:20: forward d=1 beats backward d=13
    // exact tie at equal distances resolves backward (pandas semantics)
    val tie = AsOfJoin.asOfJoin(trades, quotes, Seq("sym"), "ts", Seq("quote"),
      direction = "nearest")
    val a5 = tie.filter($"price" === 100.0).head() // prev d=5, next d=5
    assert(a5.getDouble(3) == 99.5)
  }

  test("validates inputs") {
    assertThrows[IllegalArgumentException](
      AsOfJoin.asOfJoin(trades, quotes, Nil, "ts", Seq("quote")))
    assertThrows[IllegalArgumentException](
      AsOfJoin.asOfJoin(trades, quotes, Seq("sym"), "ts", Seq("price")))
  }

  test("plans one shuffle on the key (window), not a join explosion") {
    val out = AsOfJoin.asOfJoin(trades, quotes, Seq("sym"), "ts", Seq("quote"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"as-of join should not plan a product join:\n$plan")
  }

  test("no direction plans an UnboundedFollowing window frame (O(n^2) per partition)") {
    // Spark evaluates a [currentRow, unboundedFollowing] frame with
    // UnboundedFollowingWindowFunctionFrame, recomputing the aggregate
    // from scratch per row — quadratic in key-partition size. Every
    // direction must compile to running [unboundedPreceding, currentRow]
    // frames only (forward via the reversed sort).
    for (dir <- AsOfJoin.directions) {
      val out = AsOfJoin.asOfJoin(trades, quotes, Seq("sym"), "ts", Seq("quote"),
        direction = dir)
      val plan = out.queryExecution.optimizedPlan.toString
      assert(!plan.contains("unboundedfollowing"),
        s"direction '$dir' plans an UnboundedFollowing frame:\n$plan")
    }
  }
}
