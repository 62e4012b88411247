package graft.observability

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RunMetricsSpec extends SparkTestBase {

  test("a shuffling aggregate reports exchange bytes; a narrow filter reports none") {
    val dir = java.nio.file.Files.createTempDirectory("graft_runmetrics").toString
    spark.range(20000).select((col("id") % 97).as("k"), col("id").as("v"))
      .write.mode("overwrite").parquet(dir)
    val base = spark.read.parquet(dir)

    val wide = RunMetricsProbe.measure(base.groupBy("k").agg(sum("v")))
    assert(wide.rows == 97)
    assert(wide.shuffleWriteBytes > 0,
      s"groupBy must report exchange bytes: $wide")
    assert(wide.stages >= 2, s"shuffled agg runs >= 2 stages: $wide")
    assert(wide.inputBytes > 0, s"parquet scan must report input bytes: $wide")

    val narrow = RunMetricsProbe.measure(base.filter(col("v") % 2 === 0))
    assert(narrow.rows == 10000)
    // count()'s own partial-count reduce is the probe's noise floor
    // (~50 B/task); a genuinely shuffling plan reads orders above it
    assert(narrow.shuffleWriteBytes < 2048,
      s"a filter must not shuffle beyond count's own reduce: $narrow")
    assert(wide.shuffleWriteBytes > narrow.shuffleWriteBytes * 5,
      s"agg exchange must dominate the noise floor: $wide vs $narrow")
  }

  test("counters reset per measurement (listener detached between runs)") {
    val d = spark.range(5000).select((col("id") % 11).as("k"))
    val first = RunMetricsProbe.measure(d.groupBy("k").count())
    val second = RunMetricsProbe.measure(d.groupBy("k").count())
    // same job measured twice: byte counts within 2x of each other
    // (not accumulated across runs)
    assert(second.shuffleWriteBytes < first.shuffleWriteBytes * 2 + 1,
      s"counters leaked across measurements: $first vs $second")
  }
}
