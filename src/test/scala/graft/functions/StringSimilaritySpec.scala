package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase

class StringSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    StringSimKernels.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel matches DuckDB jaro_winkler_similarity reference values") {
    // pinned from duckdb (also cross-checked on 20k random pairs:
    // integer-halved transpositions, boost only when jaro > 0.7,
    // either-empty → 0.0)
    val pins = Seq(
      ("MARTHA", "MARHTA") -> 0.9611111111111111,
      ("DIXON", "DICKSONX") -> 0.8133333333333332,
      ("JELLYFISH", "SMELLYFISH") -> 0.8962962962962964,
      ("abc", "abc") -> 1.0,
      ("", "abc") -> 0.0,
      ("", "") -> 0.0,
      ("a", "b") -> 0.0,
      ("CRATE", "TRACE") -> 0.7333333333333334,
      ("DWAYNE", "DUANE") -> 0.8400000000000001,
      ("hello world", "hello wrold") -> 0.9818181818181818,
      ("ab", "ba") -> 0.0,
      ("abcdxxxx", "abcdyyyyzzzz") -> 0.611111111111111, // jaro < 0.7: NO boost
      ("aaaaaaaaaaaaaaaaaaaab", "aaaaaaaaaaaaaaaaaaaax") -> 0.9809523809523809)
    for (((a, b), want) <- pins)
      assert(math.abs(jw(a, b) - want) < 1e-12, s"jw($a, $b) = ${jw(a, b)}, want $want")
  }

  test("symmetry, bounds, and the prefix cap at 4") {
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 500) {
      val a = rng.alphanumeric.take(rng.nextInt(12)).mkString
      val b = rng.alphanumeric.take(rng.nextInt(12)).mkString
      val s = jw(a, b)
      assert(s == jw(b, a), s"asymmetric on ($a, $b)")
      assert(s >= 0.0 && s <= 1.0)
    }
    // prefixes beyond 4 chars must not add boost
    val j4 = StringSimKernels.jaro(UTF8String.fromString("abcde_longtail_x"),
      UTF8String.fromString("abcde_longtail_y"))
    assert(math.abs(jw("abcde_longtail_x", "abcde_longtail_y") -
      (j4 + 4 * 0.1 * (1 - j4))) < 1e-12)
  }

  test("column expression evaluates through codegen and matches the kernel") {
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("", ""),
      (null, "x"), ("y", null))
      .toDF("a", "b")
    val out = df.select(StringSimilarity.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out(0).contains(0.9611111111111111))
    assert(out(1).contains(0.8133333333333332))
    assert(out(2).contains(0.0))
    assert(out(3).isEmpty && out(4).isEmpty, "null inputs → null")
    // a LocalRelation folds eagerly; use range() to see the real plan
    val plan = spark.range(5)
      .select(concat(lit("abc"), col("id")).as("a"), lit("abd").as("b"))
      .select(StringSimilarity.jaro(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    // '*' prefix = inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), s"fell out of codegen:\n$plan")
  }

  test("non-string inputs fail analysis") {
    val df = Seq((1, "x")).toDF("n", "s")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(StringSimilarity.jaroWinkler(col("n"), col("s"))).collect()
    }
  }
}
