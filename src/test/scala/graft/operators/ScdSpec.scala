package graft.operators

import graft.SparkTestBase

class ScdSpec extends SparkTestBase {
  import spark.implicits._

  test("scdType2 collapses runs into validity intervals") {
    val log = Seq(
      (1L, 10L, "A"), (1L, 20L, "A"), (1L, 30L, "B"), (1L, 40L, "B"), (1L, 50L, "A"),
      (2L, 15L, "X")
    ).toDF("k", "t", "status")
    val out = Scd.scdType2(log, "k", Seq("t"), Seq("status"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
    assert(out == Set(
      (1L, "A", 10L, 30L, false),
      (1L, "B", 30L, 50L, false),
      (1L, "A", 50L, -1L, true),
      (2L, "X", 15L, -1L, true)))
  }

  test("scdType2 is null-safe on tracked attributes") {
    val log = Seq(
      (1L, 10L, Some("A")), (1L, 20L, None), (1L, 30L, None), (1L, 40L, Some("A"))
    ).toDF("k", "t", "status")
    val out = Scd.scdType2(log, "k", Seq("t"), Seq("status"))
    // A -> null -> A = three intervals (the two nulls collapse)
    assert(out.count() == 3)
  }

  test("scdType2Merge equals a full rebuild under the append-only contract") {
    val r = new scala.util.Random(7)
    val log = (1 to 400).map { i =>
      (r.nextInt(20).toLong, i.toLong, Seq("A", "B", "C")(r.nextInt(3)))
    }.toDF("k", "t", "status")
    val old = log.filter($"t" <= 250)
    val updates = log.filter($"t" > 250)
    val merged = Scd.scdType2Merge(
      Scd.scdType2(old, "k", Seq("t"), Seq("status")),
      updates, "k", Seq("t"), Seq("status"))
    val full = Scd.scdType2(log, "k", Seq("t"), Seq("status"))
    assertDfEqual(
      merged.select("k", "status", "valid_from", "valid_to", "is_current"),
      full.select("k", "status", "valid_from", "valid_to", "is_current"))
  }

  test("scdType2Merge: unchanged keys keep their open interval; new keys appear") {
    val hist = Scd.scdType2(
      Seq((1L, 10L, "A"), (2L, 10L, "X")).toDF("k", "t", "status"),
      "k", Seq("t"), Seq("status"))
    val updates = Seq((2L, 20L, "Y"), (3L, 30L, "Z")).toDF("k", "t", "status")
    val out = Scd.scdType2Merge(hist, updates, "k", Seq("t"), Seq("status"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(out == Set(
      (1L, "A", 10L, -1L), (2L, "X", 10L, 20L), (2L, "Y", 20L, -1L), (3L, "Z", 30L, -1L)))
  }

  test("scdType2 tiebreak column makes equal timestamps deterministic") {
    val log = Seq(
      (1L, 10L, 1L, "A"), (1L, 10L, 2L, "B"), (1L, 20L, 3L, "B")
    ).toDF("k", "t", "seq", "status")
    val out = Scd.scdType2(log, "k", Seq("t", "seq"), Seq("status"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(out == Set(("A", 10L), ("B", 10L)))
  }
}
