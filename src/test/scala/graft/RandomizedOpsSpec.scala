package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Randomised invariants for the r11b operator families — seeded
  * generators (deterministic), invariants that must hold for ANY
  * input rather than hand-picked examples. */
class RandomizedOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def rng(seed: Int) = new scala.util.Random(seed)

  test("chunkDocuments: zero-overlap chunks reconstruct the normalised text") {
    for (seed <- 1 to 3) {
      val r = rng(seed)
      val docs = (1 to 30).map { i =>
        val n = r.nextInt(40)
        (i.toLong, (0 until n).map(_ => s"w${r.nextInt(50)}").mkString("  ", "   ", " "))
      }.toDF("doc_id", "text")
      val rebuilt = graft.text.Chunker
        .chunkDocuments(docs, "doc_id", "text", chunkTokens = 7, overlapTokens = 0)
        .groupBy("doc_id")
        .agg(concat_ws(" ", sort_array(collect_list(struct(col("chunk_id"), col("chunk_text"))))
          .getField("chunk_text")).as("joined"))
      val expected = docs
        .select(col("doc_id"), graft.text.TextFunctions.normalizeText(col("text")).as("norm"))
        .filter(length(col("norm")) > 0)
      val diff = rebuilt.join(expected, "doc_id")
        .filter(col("joined") =!= col("norm")).count()
      assert(diff == 0, s"seed $seed: chunk reassembly diverged")
    }
  }

  test("funnel: counts are non-increasing and step 1 equals first-step presence") {
    for (seed <- 1 to 3) {
      val r = rng(seed)
      val steps = Seq("a", "b", "c")
      val evs = (1 to 400).map { _ =>
        (r.nextInt(40).toLong, new Timestamp(r.nextInt(100000) * 1000L),
          Seq("a", "b", "c", "d", "e")(r.nextInt(5)))
      }.toDF("u", "t", "s")
      val out = graft.operators.EventAnalytics.funnel(evs, "u", "t", "s", steps)
        .orderBy("step").select("n_entities").as[Long].collect()
      assert(out.length == 3)
      assert(out.sliding(2).forall(p => p(0) >= p(1)), s"seed $seed: not monotone")
      val firstStep = evs.filter(col("s") === "a").select("u").distinct().count()
      assert(out.head == firstStep, s"seed $seed: step-1 count mismatch")
    }
  }

  test("winsorize: row count preserved, outputs inside the group bounds") {
    for (seed <- 1 to 3) {
      val r = rng(seed)
      val df = (1 to 500).map(_ => (s"g${r.nextInt(4)}", r.nextGaussian() * 100)).toDF("g", "v")
      val out = graft.core.Stats.winsorize(df, Seq("g"), "v", lowP = 0.1, highP = 0.9)
      assert(out.count() == 500)
      val viol = out.groupBy("g")
        .agg(max("v_wins").as("mx"), min("v_wins").as("mn"),
          expr("percentile(v, 0.9)").as("hi"), expr("percentile(v, 0.1)").as("lo"))
        .filter(col("mx") > round(col("hi"), 6) + 1e-6 || col("mn") < round(col("lo"), 6) - 1e-6)
        .count()
      assert(viol == 0, s"seed $seed: winsorized value escaped bounds")
    }
  }

  test("assignContiguousIds: ids are exactly 0..n-1 and order-consistent") {
    for (seed <- 1 to 2) {
      val r = rng(seed)
      val keys = r.shuffle((1 to 777).toList).map(_.toLong)
      val df = keys.toDF("k")
      val out = graft.operators.Ids.assignContiguousIds(df, Seq("k"), numPartitions = Some(5))
        .select("k", "row_id").as[(Long, Long)].collect()
      assert(out.map(_._2).sorted.toSeq == (0L until 777L))
      // id order == key order
      assert(out.sortBy(_._2).map(_._1).toSeq == keys.sorted)
    }
  }

  test("fillGaps: per-key grid is contiguous and ffill is never null") {
    for (seed <- 1 to 3) {
      val r = rng(seed)
      val df = (1 to 300).map(_ =>
        (s"k${r.nextInt(5)}", new Timestamp(r.nextInt(5000) * 1000L), r.nextDouble()))
        .toDF("k", "t", "v")
      val out = graft.operators.TimeSeries.fillGaps(df, "k", "t", "v", intervalSec = 60L)
      val perKey = out.groupBy("k").agg(count(lit(1)).as("n"),
        min("bucket_start").as("lo"), max("bucket_start").as("hi"),
        sum(when(col("ffill_value").isNull, 1).otherwise(0)).as("nulls"))
        .collect()
      perKey.foreach { row =>
        val (n, lo, hi, nulls) =
          (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
        assert(n == (hi - lo) / 60L + 1, s"seed $seed: grid not contiguous")
        assert(nulls == 0L, s"seed $seed: null ffill")
      }
    }
  }
}
