package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IdsSpec extends SparkTestBase {
  import spark.implicits._

  test("assignContiguousIds matches the global row_number order") {
    val df = spark.range(1000).select((col("id") * 37 % 1000).as("k"))
      .distinct() // unique order key 0..999 in scrambled row order
    val out = Ids.assignContiguousIds(df, Seq("k"), numPartitions = Some(7))
    val pairs = out.select("k", "row_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(pairs.length == 1000)
    // k values are exactly 0..999, so row_id must equal k
    assert(pairs.forall { case (k, id) => k == id })
  }

  test("assignContiguousIds ids are contiguous and unique on real data") {
    val df = Seq("c", "a", "b", "e", "d").toDF("s")
    val out = Ids.assignContiguousIds(df, Seq("s"), numPartitions = Some(3))
      .select("s", "row_id").as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L, "e" -> 4L))
  }

  test("naive and scalable formulations agree") {
    val df = spark.range(500).select((col("id") * 13 % 500).as("k")).distinct()
    val fast = Ids.assignContiguousIds(df, Seq("k"), numPartitions = Some(5))
    val naive = Ids.assignContiguousIdsNaive(df, Seq("k"))
    assertDfEqual(fast.select("k", "row_id"), naive.select("k", "row_id"))
  }
}
