package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AggStateSpec extends SparkTestBase {
  import spark.implicits._

  private def raw = (1 to 1000).map(i =>
    (s"d${i % 10}", s"g${i % 3}", i.toDouble)).toDF("day", "g", "v")

  test("build → merge → finish equals the single-pass aggregate exactly (sans sketch)") {
    val daily = AggState.build(raw, Seq("g", "day"), "v")
    val merged = AggState.finish(AggState.merge(daily, Seq("g")))
      .select("g", "n", "sum", "min", "max", "mean")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val direct = AggState.finish(AggState.build(raw, Seq("g"), "v"))
      .select("g", "n", "sum", "min", "max", "mean")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(merged == direct, "count/sum/min/max/mean must merge EXACTLY")
  }

  test("distinct estimate survives merge within the error bar") {
    val daily = AggState.build(raw, Seq("g", "day"), "v")
    val est = AggState.finish(AggState.merge(daily, Seq("g")))
      .select("g", "approx_distinct")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // per g: values i with i%3==k, ~333 distinct
    est.foreach { case (g, e) =>
      assert(math.abs(e - 333.0) / 333.0 < 0.05, s"$g: $e") }
  }

  test("states survive a parquet round-trip and a second merge level") {
    val daily = AggState.build(raw, Seq("g", "day"), "v")
    val dir = java.nio.file.Files.createTempDirectory("graft_aggstate").toString
    daily.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    // day → (g, parity of day) → g: two merge hops
    val mid = AggState.merge(
      reloaded.withColumn("half", length(col("day")) % 2), Seq("g", "half"))
    val top = AggState.finish(AggState.merge(mid, Seq("g")))
      .select("g", "n", "sum").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val direct = AggState.finish(AggState.build(raw, Seq("g"), "v"))
      .select("g", "n", "sum").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(top == direct)
  }

  test("streaming maintenance: multi-batch state table equals the batch build") {
    val dir = java.nio.file.Files.createTempDirectory("graft_aggstate_stream").toString
    raw.filter(col("day") < "d5").write.mode("overwrite").parquet(s"$dir/in")
    Thread.sleep(1000)
    raw.filter(col("day") >= "d5").write.mode("append").parquet(s"$dir/in")
    val streamed = spark.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = graft.streaming.Streaming.aggStateStream(
      streamed, Seq("g"), "v", s"$dir/state", s"$dir/ckpt")
    assert(q.awaitTermination(120000), "stream did not finish")
    val states = spark.read.parquet(s"$dir/state")
    assert(states.select("batch_id").distinct().count() >= 2,
      "state table must hold one partition per micro-batch")
    val merged = AggState.finish(AggState.merge(states, Seq("g")))
      .select("g", "n", "sum", "min", "max", "mean")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val direct = AggState.finish(AggState.build(raw, Seq("g"), "v"))
      .select("g", "n", "sum", "min", "max", "mean")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(merged == direct)
  }

  test("empty-state mean is null; missing columns throw") {
    val empty = AggState.build(
      raw.filter(col("v") < 0), Seq("g"), "v")
    // no rows → no groups → finish on zero rows is fine
    assert(AggState.finish(empty).count() == 0)
    intercept[graft.ColumnNotInDataframeError](
      AggState.build(raw, Seq("nope"), "v"))
    intercept[graft.ColumnNotInDataframeError](
      AggState.merge(raw, Seq("g"))) // raw lacks state columns
  }
}
