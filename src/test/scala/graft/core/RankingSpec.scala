package graft.core

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RankingSpec extends SparkTestBase {
  import spark.implicits._

  private def naiveTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  test("topKPerGroup matches the naive window formulation (seeded random)") {
    val rng = new scala.util.Random(42)
    val rows = (1 to 400).map(i =>
      (s"g${rng.nextInt(5)}", i.toLong, rng.nextInt(50).toDouble))
    val df = rows.toDF("g", "id", "v").repartition(7)
    val got = Ranking.topKPerGroup(df, Seq("g"), "v", 3, tieCol = "id")
      .select("g", "id", "v", "rank").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val want = naiveTopK(df, 3).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == want)
  }

  test("topKPerGroup: ascending order, short groups keep all rows, nulls drop") {
    val df = Seq(
      ("a", 1L, Some(30.0)), ("a", 2L, Some(10.0)), ("a", 3L, Some(20.0)),
      ("b", 4L, Some(5.0)), ("b", 5L, None))
      .toDF("g", "id", "v")
    val out = Ranking.topKPerGroup(df, Seq("g"), "v", 2,
      tieCol = "id", descending = false)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSet
    assert(out == Set(("a", 2L, 1), ("a", 3L, 2), ("b", 4L, 1)),
      "null-v row must not rank; 1-row group keeps its row")
  }

  test("topKPerGroup: exact ranks survive heavy ties (tie key decides)") {
    val df = (1L to 20L).map(i => ("g", i, 7.0)).toDF("g", "id", "v")
      .repartition(5)
    val out = Ranking.topKPerGroup(df, Seq("g"), "v", 4, tieCol = "id")
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.toSeq == Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4)))
  }

  test("scale shape: heap prune feeds the window; argmax has no window at all") {
    val df = (1 to 100).map(i => (s"g${i % 3}", i.toLong, i.toDouble))
      .toDF("g", "id", "v")
    val topkPlan = Ranking.topKPerGroup(df, Seq("g"), "v", 2, "id")
      .queryExecution.executedPlan.toString
    assert(topkPlan.contains("MapPartitions"),
      s"bounded prune missing from:\n$topkPlan")
    val argmaxPlan = Ranking.argmaxPerGroup(df, Seq("g"), "v", "id")
      .queryExecution.executedPlan.toString
    assert(!argmaxPlan.contains("Window"),
      s"argmax must be a grouped agg, not a window:\n$argmaxPlan")
  }

  test("argmaxPerGroup picks max row, ties to largest tie; minimize flips both") {
    val df = Seq(
      ("a", 1L, 10.0, "x"), ("a", 2L, 10.0, "y"), ("a", 3L, 5.0, "z"),
      ("b", 4L, 1.0, "w"), ("b", 5L, 1.0, "u"))
      .toDF("g", "id", "v", "payload")
    val mx = Ranking.argmaxPerGroup(df, Seq("g"), "v", "id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(mx("a") == (2L, "y"), "max ties to the largest tie key")
    assert(mx("b") == (5L, "u"))
    val mn = Ranking.argmaxPerGroup(df, Seq("g"), "v", "id", maximize = false)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mn("a") == 3L, "strict minimum wins")
    assert(mn("b") == 4L, "minimize ties to the smallest tie key")
  }
}
