package graft.operators

import graft.SparkTestBase

class JoinDiagnosticsSpec extends SparkTestBase {
  import spark.implicits._

  private def left = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 4), ("c", 5))
    .toDF("k", "lv")
  private def right = Seq(("a", 10), ("a", 20), ("b", 30), ("d", 40))
    .toDF("k", "rv")

  test("joinCardinalityByKey reports per-key products, heaviest first") {
    val out = JoinDiagnostics.joinCardinalityByKey(left, right, Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // only keys on both sides; a: 3x2=6, b: 1x1=1; c/d absent
    assert(out.toSeq == Seq(("a", 3L, 2L, 6L), ("b", 1L, 1L, 1L)))
  }

  test("estimateJoinOutputRows is exact against the actual join") {
    val est = JoinDiagnostics.estimateJoinOutputRows(left, right, Seq("k"))
    val actual = left.join(right, Seq("k")).count()
    assert(est == actual && est == 7L)
    // empty intersection
    assert(JoinDiagnostics.estimateJoinOutputRows(
      left.filter($"k" === "c"), right, Seq("k")) == 0L)
  }

  test("requireJoinSafe passes under the bound, throws over it naming offenders") {
    JoinDiagnostics.requireJoinSafe(left, right, Seq("k"), maxOutputRows = 7L)
    val e = intercept[graft.PipelineError] {
      JoinDiagnostics.requireJoinSafe(left, right, Seq("k"), maxOutputRows = 6L)
    }
    assert(e.getMessage.contains("7 rows") && e.getMessage.contains("k=a -> 6"))
  }

  test("multi-column keys and missing columns") {
    val l2 = Seq(("a", 1, "x"), ("a", 1, "y")).toDF("k1", "k2", "p")
    val r2 = Seq(("a", 1, "z")).toDF("k1", "k2", "q")
    assert(JoinDiagnostics.estimateJoinOutputRows(l2, r2, Seq("k1", "k2")) == 2L)
    val e = intercept[graft.ColumnNotInDataframeError](
      JoinDiagnostics.joinCardinalityByKey(left, right, Seq("zzz")))
    assert(e.getMessage.contains("zzz"))
  }

  test("diagnosis joins count frames, not the corpora: aggregates below the join") {
    val plan = JoinDiagnostics.joinCardinalityByKey(left, right, Seq("k"))
      .queryExecution.executedPlan.toString
    // both sides must aggregate before any join operator appears
    val aggIdx = plan.linesIterator.zipWithIndex
      .filter(_._1.contains("HashAggregate")).map(_._2).toSeq
    val joinIdx = plan.linesIterator.zipWithIndex
      .filter(l => l._1.contains("Join")).map(_._2).toSeq
    assert(aggIdx.nonEmpty && joinIdx.nonEmpty)
    assert(joinIdx.head < aggIdx.max,
      s"expected aggregates feeding the join:\n$plan")
  }
}
