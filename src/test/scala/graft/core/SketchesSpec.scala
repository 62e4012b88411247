package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("sketch estimate tracks exact distinct within HLL error") {
    val df = (1 to 20000).map(i => ("g", i % 5000)).toDF("g", "v")
    val est = Sketches.withEstimate(Sketches.hllSketches(df, Seq("g"), "v"))
      .head().getAs[Long]("approx_distinct")
    assert(math.abs(est - 5000.0) / 5000.0 < 0.05, s"estimate $est vs exact 5000")
  }

  test("merging fine sketches adds no error vs sketching the union directly") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 5000).map(_ => (s"d${rng.nextInt(30)}", rng.nextInt(800)))
    val exact = rows.map(_._2).distinct.size.toDouble
    val df = rows.toDF("day", "user").withColumn("g", lit("all"))
    val merged = Sketches.withEstimate(
      Sketches.mergeSketches(
        Sketches.hllSketches(df, Seq("g", "day"), "user"), Seq("g")))
      .head().getAs[Long]("approx_distinct")
    val direct = Sketches.withEstimate(Sketches.hllSketches(df, Seq("g"), "user"))
      .head().getAs[Long]("approx_distinct")
    // union preserves the error bar; it is NOT bit-identical to the
    // one-pass sketch (sparse→dense promotion differs): 796 vs 789 here
    assert(math.abs(merged - exact) / exact < 0.05,
      s"merged=$merged drifted from exact=$exact")
    assert(math.abs(direct - exact) / exact < 0.05,
      s"direct=$direct drifted from exact=$exact")
  }

  test("sketches survive a parquet round-trip (the state-table contract)") {
    val df = (1 to 3000).map(i => (s"p${i % 3}", i)).toDF("p", "v")
    val sketches = Sketches.hllSketches(df, Seq("p"), "v")
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString
    sketches.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val before = Sketches.withEstimate(sketches)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("approx_distinct")).toMap
    val after = Sketches.withEstimate(Sketches.mergeSketches(reloaded, Seq("p")))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("approx_distinct")).toMap
    assert(after == before)
  }

  test("bad lgConfigK and missing columns throw") {
    val df = Seq(("a", 1)).toDF("g", "v")
    intercept[IllegalArgumentException](
      Sketches.hllSketches(df, Seq("g"), "v", lgConfigK = 2))
    intercept[graft.ColumnNotInDataframeError](
      Sketches.hllSketches(df, Seq("nope"), "v"))
  }

  test("scale shape: sketch agg shuffles fixed-width sketches, not value sets") {
    val df = (1 to 1000).map(i => (s"g${i % 4}", i)).toDF("g", "v")
    val plan = Sketches.hllSketches(df, Seq("g"), "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected a typed-buffer aggregate in:\n$plan")
    assert(plan.contains("partial"), s"partial (map-side) agg missing from:\n$plan")
  }
}
