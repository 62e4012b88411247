package graft.core

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** stageFence (the observe/CollectMetrics optimizer barrier) must stay
  * transparent to every composition shape a caller can reach: self
  * joins and unions of a fenced frame (the same metric name appears at
  * multiple points of one plan), joins between independently fenced
  * frames, and sinks. A plan-shape regression here surfaces as an
  * AnalysisException (duplicate observed metrics), not a wrong result,
  * so count-level assertions suffice. */
class StageFenceSpec extends SparkTestBase {
  import spark.implicits._
  test("stageFence frame self-join works") {
    val df = graft.core.DataFrameOps.stageFence(
      Seq((1, "a"), (2, "b")).toDF("id", "s"))
    val j = df.as("l").join(df.as("r"), $"l.id" === $"r.id")
    assert(j.count() == 2)
  }
  test("fenced gopherFlags output self-union and reuse") {
    val docs = Seq((1L, "the quick brown fox and that dog have with be to of"),
      (2L, "word")).toDF("doc_id", "text")
    val f = graft.text.QualityRules.gopherFlags(docs, "text", minWords = 2, minStopwords = 1)
    assert(f.union(f).count() == 4)
    assert(f.join(f.select($"doc_id".as("d2"), $"gopher_pass".as("g2")),
      $"doc_id" === $"d2").count() == 2)
  }
  test("two independently fenced frames join") {
    val a = graft.core.DataFrameOps.stageFence(Seq((1, "x")).toDF("id", "s"))
    val b = graft.core.DataFrameOps.stageFence(Seq((1, "y")).toDF("id", "t"))
    assert(a.join(b, "id").count() == 1)
  }
  test("fence works under cache and streaming-free write") {
    val df = graft.core.DataFrameOps.stageFence(Seq((1, "a")).toDF("id", "s"))
    val p = java.nio.file.Files.createTempDirectory("fence").toString + "/out"
    df.write.mode("overwrite").parquet(p)
    assert(spark.read.parquet(p).count() == 1)
  }
  test("fence holds through AQE execution and persist: one derivation copy") {
    // three filter conjuncts on the fenced derived column: without the
    // fence, pushdown substitutes the derivation into each conjunct
    // (3 copies × 2 nodes = 6 regexp_replace); the fence must keep the
    // defining projection's 2 — including in the FINAL adaptive plan
    // (AQE's runtime re-optimizer must not re-push across the fence)
    val derived = spark.range(100).toDF("id")
      .withColumn("s", concat(lit("a"), col("id")))
      .withColumn("big",
        regexp_replace(regexp_replace(col("s"), "a", "b"), "b", "c"))
    val out = graft.core.DataFrameOps.stageFence(derived)
      .filter(length(col("big")) > 0 && col("big") =!= "zzz" &&
        col("big") =!= "yyy")
    assert(out.count() == 100) // executes (AQE finalizes the plan)
    for ((plan, label) <- Seq(
        (out.queryExecution.optimizedPlan.toString, "optimized"),
        (out.queryExecution.executedPlan.toString, "final adaptive"))) {
      val copies = plan.split("regexp_replace", -1).length - 1
      assert(copies == 2,
        s"$label plan must keep ONE derivation (2 regexp_replace nodes), got $copies:\n$plan")
    }
    assert(out.queryExecution.executedPlan.toString.contains("CollectMetrics"),
      "fence node missing from the executed plan")
    val cached = out.persist()
    try assert(cached.count() == 100) finally cached.unpersist()
  }
}
