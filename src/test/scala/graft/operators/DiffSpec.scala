package graft.operators

import graft.SparkTestBase

class DiffSpec extends SparkTestBase {
  import spark.implicits._

  private def oldDf = Seq(
    (1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40))
    .toDF("id", "text", "v")

  test("snapshotDiff classifies all four statuses") {
    val newDf = Seq(
      (1L, "a", 10),   // unchanged
      (2L, "B!", 20),  // changed (text)
      (3L, "c", 31),   // changed (v)
      (5L, "e", 50))   // added; 4 removed
      .toDF("id", "text", "v")
    val out = Diff.snapshotDiff(oldDf, newDf, "id", Seq("text", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
  }

  test("null payloads are null-safe: null==null is unchanged, null!=value is changed") {
    val o = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("id", "text")
    val n = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "text")
    val out = Diff.snapshotDiff(o, n, "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("diffSummary reduces to status counts") {
    val newDf = Seq((1L, "a", 10), (2L, "zz", 20), (9L, "i", 9))
      .toDF("id", "text", "v")
    val out = Diff.diffSummary(oldDf, newDf, "id", Seq("text", "v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("unchanged" -> 1L, "changed" -> 1L, "removed" -> 2L,
      "added" -> 1L))
  }

  test("compare payload crosses the exchange once: struct built below the join") {
    val plan = Diff.snapshotDiff(oldDf, oldDf, "id", Seq("text", "v"))
      .queryExecution.executedPlan.toString
    // both exchanges must carry the single struct column, not the raw cols
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning(id")).toSeq
    assert(exchanges.isEmpty || !plan.contains("text#"),
      s"raw payload columns should be folded into the struct:\n$plan")
  }

  test("missing columns name the side") {
    val e = intercept[graft.ColumnNotInDataframeError](
      Diff.snapshotDiff(oldDf, oldDf.drop("v"), "id", Seq("text", "v")))
    assert(e.getMessage.contains("new") && e.getMessage.contains("v"))
  }
}
