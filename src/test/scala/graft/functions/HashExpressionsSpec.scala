package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.Dedup

class HashExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private def hashed = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "completely different text about distributed query engines"),
    (3L, "")
  ).toDF("id", "text")
    .withColumn("toks", graft.text.TextFunctions.tokens($"text"))
    .withColumn("th", transform($"toks", t => xxhash64(t)))

  test("native MinHash signature equals the HOF formulation bit-for-bit") {
    val both = hashed
      .withColumn("native", HashFunctions.minHashSignatureNative($"th", 16))
      .withColumn("hof", Dedup.minHashSignatureFromHashes($"th", 16))
      .filter(size($"th") > 0)
    val rows = both.select("id", "native", "hof").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"mismatch for id ${r.getLong(0)}")
    }
  }

  test("native SimHash equals the HOF formulation bit-for-bit") {
    val both = hashed
      .withColumn("native", HashFunctions.simHashNative($"th"))
      .withColumn("hof", Dedup.simHashFromTokenHashes($"th"))
    both.select("id", "native", "hof").collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"mismatch for id ${r.getLong(0)}")
    }
  }

  test("native expressions stay inside whole-stage codegen") {
    // a local relation would constant-fold to LocalTableScan — use a
    // range source so a real codegen stage is planned
    val plan = spark.range(100)
      .withColumn("th", array(xxhash64($"id"), xxhash64($"id" + 1)))
      .withColumn("sig", HashFunctions.minHashSignatureNative($"th", 8))
      .withColumn("sim", HashFunctions.simHashNative($"th"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val projectLine = plan.linesIterator
      .find(_.contains("minhash_signature")).getOrElse("")
    assert(projectLine.trim.startsWith("*("),
      s"native expressions fell out of codegen:\n$plan")
  }

  test("type checking rejects non array<long> input") {
    val e = intercept[Exception](
      Seq("x").toDF("s").select(HashFunctions.simHashNative($"s")).collect())
    assert(e.getMessage.contains("array<bigint>"))
  }

  test("empty array: MinHash yields MaxValue sentinels, SimHash yields 0") {
    val row = Seq(Seq.empty[Long]).toDF("th")
      .select(HashFunctions.minHashSignatureNative($"th", 4).as("sig"),
        HashFunctions.simHashNative($"th").as("sim")).head()
    assert(row.getSeq[Long](0) == Seq.fill(4)(Long.MaxValue))
    assert(row.getLong(1) == 0L)
  }
}
