package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LinkageSpec extends SparkTestBase {
  import spark.implicits._

  private def a = Seq(
    (1L, "blk1", "acme corporation", "new york"),
    (2L, "blk1", "bravo industries", "boston"),
    (3L, "blk2", "charlie supplies", "chicago"))
    .toDF("id", "blk", "name", "city")

  private def b = Seq(
    (10L, "blk1", "acme corpration", "new york"),   // typo'd near-match of 1
    (20L, "blk1", "zzz unrelated", "miami"),
    (30L, "blk9", "acme corporation", "new york"))  // exact text, WRONG block
    .toDF("id", "blk", "name", "city")

  test("links fuzzy matches within blocks; blocking excludes cross-block pairs") {
    val links = Linkage.linkRecords(a, b, "id", "blk",
      Seq("name" -> 0.7, "city" -> 0.3), threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(links.contains((1L, 10L)), "typo'd pair must link")
    assert(!links.exists(_._2 == 30L),
      "identical record in another block must NOT pair (blocking contract)")
    assert(!links.exists(_._2 == 20L))
  }

  test("weighted score is the exact weighted jaro-winkler average") {
    val out = Linkage.linkRecords(a, b, "id", "blk",
      Seq("name" -> 0.7, "city" -> 0.3), threshold = 0.0)
      .filter(col("id_a") === 1 && col("id_b") === 10).head().getDouble(2)
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val jwName = graft.functions.StringSimKernels.jaroWinkler(
      u("acme corporation"), u("acme corpration"))
    val expected = BigDecimal((0.7 * jwName + 0.3 * 1.0) / 1.0)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == expected)
  }

  test("null field counts as disagreement at full weight, not renormalised") {
    val a2 = Seq((1L, "x", "same", Option.empty[String])).toDF("id", "blk", "name", "city")
    val b2 = Seq((2L, "x", "same", Option("anything"))).toDF("id", "blk", "name", "city")
    val score = Linkage.linkRecords(a2, b2, "id", "blk",
      Seq("name" -> 0.5, "city" -> 0.5), threshold = 0.0).head().getDouble(2)
    assert(score == 0.5, s"null city must zero its half: $score")
  }

  test("sortedNeighborhoodPairs: exactly the rank-adjacent pairs, any partitioning") {
    val df = (1L to 50L).map(i => (i, f"name_${i}%03d")).toDF("id", "name")
      .repartition(7)
    val pairs = Linkage.sortedNeighborhoodPairs(df, "id", Seq("name", "id"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // sorted order == id order here; every (i, j) with 0 < j-i <= 3
    val want = (for {
      i <- 1L to 50L; j <- (i + 1) to math.min(i + 3, 50L)
    } yield (i, j, j - i)).toSet
    assert(pairs == want, s"got ${pairs.size}, want ${want.size}")
  }

  test("sortedNeighborhoodPairs catches matches equi-blocking separates") {
    val df = Seq((1L, "acme corp"), (2L, "acmecorp"), (3L, "zzz far away"))
      .toDF("id", "name")
    // substr(1,5) blocks differ ("acme " vs "acmec") — but they sort adjacent
    val pairs = Linkage.sortedNeighborhoodPairs(df, "id", Seq("name", "id"), 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("bad args throw") {
    intercept[IllegalArgumentException](
      Linkage.linkRecords(a, b, "id", "blk", Nil, 0.5))
    intercept[graft.ColumnNotInDataframeError](
      Linkage.linkRecords(a, b, "id", "blk", Seq("nope" -> 1.0), 0.5))
    intercept[IllegalArgumentException](
      Linkage.linkRecords(a, b, "id", "blk", Seq("name" -> 1.0), 1.5))
  }
}
