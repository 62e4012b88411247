package graft

import org.apache.spark.sql.functions._

/** The failure-capture contract of the correctness dump (VERDICT r10
  * item 2): a thrown query must become a durable red artifact —
  * `_failed.json` carries (name → exception), the healthy queries
  * still land as parquet, and an all-green run writes an EMPTY object
  * (whose absence of keys is what the driver's shrink-detection reads).
  */
class VerifySpec extends SparkTestBase {

  test("a deliberately-broken query lands in _failed.json; healthy queries still write") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_verify_spec").toString
    val failed = Verify.runQueries(spark, Map(
      "q_ok" -> ((s, _) => { import s.implicits._; Seq((1L, "a")).toDF("id", "x") }),
      "q_boom" -> ((_, _) => throw new IllegalStateException("planted failure")),
      // an ANALYSIS-time failure (the r10 shape: bad cast kills the
      // plan before execution) must be captured identically
      "q_bad_plan" -> ((s, _) => {
        import s.implicits._
        Seq(("t", 1L)).toDF("a", "b").select(col("nonexistent"))
      })), "unused-sf-dir", outDir)

    assert(failed.keySet == Set("q_boom", "q_bad_plan"))
    assert(failed("q_boom").contains("IllegalStateException") &&
      failed("q_boom").contains("planted failure"))
    val artifact = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$outDir/_failed.json"))
    assert(artifact.contains("q_boom") && artifact.contains("planted failure"),
      s"_failed.json must carry the failure: $artifact")
    assert(artifact.contains("q_bad_plan"),
      s"_failed.json must carry analysis-time failures: $artifact")
    assert(!artifact.contains("q_ok"))
    // the healthy query's parquet landed despite its neighbours dying
    assert(spark.read.parquet(s"$outDir/q_ok").count() == 1L)

    // output-shape gate: a nested top-level column (the shape that
    // crashes the driver's pandas comparator) is a red artifact
    val outDirN = java.nio.file.Files.createTempDirectory("graft_verify_specN").toString
    val nested = Verify.runQueries(spark, Map(
      "q_nested" -> ((s, _) => {
        import s.implicits._
        Seq((1L, Seq("a", "b"))).toDF("id", "xs")
      })), "unused", outDirN)
    assert(nested.keySet == Set("q_nested") &&
      nested("q_nested").contains("non-scalar"))

    // all-green run → empty object artifact
    val outDir2 = java.nio.file.Files.createTempDirectory("graft_verify_spec2").toString
    val none = Verify.runQueries(spark, Map(
      "q_ok" -> ((s, _) => { import s.implicits._; Seq(1L).toDF("id") })),
      "unused", outDir2)
    assert(none.isEmpty)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$outDir2/_failed.json")) == "{}")
  }
}
