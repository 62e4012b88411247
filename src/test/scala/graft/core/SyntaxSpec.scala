package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SyntaxSpec extends SparkTestBase {
  import spark.implicits._

  test("stringToCol implicit lifts strings into Column expressions") {
    import syntax._
    val d = Seq((1, 2)).toDF("a", "b")
    // "a" used where a Column is required — the to_spark_col analogue
    val out = d.select(upper(concat("a", "b")).as("c"))
    assert(out.as[String].head() == "12")
  }

  test("pipe chains transformations left to right") {
    import syntax._
    val addOne = (d: DataFrame) => d.withColumn("x", $"x" + 1)
    val double = (d: DataFrame) => d.withColumn("x", $"x" * 2)
    val out = Seq(5).toDF("x").pipe(addOne, double)
    assert(out.as[Int].head() == 12) // (5+1)*2 — order matters
  }

  test("findSparkDataFrames collects frames and nested frame maps") {
    val d1 = Seq(1).toDF("x")
    val d2 = Seq(2).toDF("y")
    val found = syntax.findSparkDataFrames(Map(
      "plain" -> d1,
      "nested" -> Map("inner" -> d2),
      "other" -> 42,
      "text" -> "not a df"))
    assert(found.keySet == Set("plain", "nested.inner"))
  }
}
