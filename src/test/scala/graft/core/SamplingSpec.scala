package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def rows = spark.range(0, 2000).toDF("id")

  test("deterministicSample is reproducible and near the target rate") {
    val a = Sampling.deterministicSample(rows, "id", 0.25, "s1")
    val b = Sampling.deterministicSample(rows, "id", 0.25, "s1")
    assert(a.select("id").as[Long].collect().toSet ==
      b.select("id").as[Long].collect().toSet)
    val n = a.count()
    assert(n > 2000 * 0.25 * 0.7 && n < 2000 * 0.25 * 1.3,
      s"sample size $n far from expected 500")
  }

  test("deterministicSample is stable under repartitioning") {
    val base = Sampling.deterministicSample(rows, "id", 0.2, "x")
      .select("id").as[Long].collect().toSet
    val shuffled = Sampling.deterministicSample(rows.repartition(7), "id", 0.2, "x")
      .select("id").as[Long].collect().toSet
    assert(base == shuffled)
  }

  test("different salts draw (mostly) independent samples") {
    val a = Sampling.deterministicSample(rows, "id", 0.5, "a")
      .select("id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(rows, "id", 0.5, "b")
      .select("id").as[Long].collect().toSet
    val overlap = a.intersect(b).size.toDouble / math.max(a.size, 1)
    assert(overlap > 0.3 && overlap < 0.7, s"overlap $overlap not ~0.5")
  }

  test("fraction bounds: 0 keeps nothing, 1 keeps everything") {
    assert(Sampling.deterministicSample(rows, "id", 0.0).count() == 0)
    assert(Sampling.deterministicSample(rows, "id", 1.0).count() == 2000)
    assertThrows[IllegalArgumentException](
      Sampling.deterministicSample(rows, "id", 1.5))
  }

  test("mixCorpora tags each source and samples at its fraction") {
    val a = spark.range(0, 1000).toDF("id")
    val b = spark.range(1000, 2000).toDF("id")
    val mixed = Sampling.mixCorpora(Seq(("web", a, 1.0), ("code", b, 0.0)), "id")
    assert(mixed.columns.contains("source"))
    assert(mixed.count() == 1000)
    assert(mixed.select("source").distinct().as[String].collect().toSeq == Seq("web"))
  }

  test("stratifiedSample respects per-stratum fractions") {
    val d = Seq.tabulate(400)(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "s")
    val out = Sampling.stratifiedSample(d, "s", Map[Any, Double]("a" -> 1.0, "b" -> 0.0))
    assert(out.filter($"s" === "b").count() == 0)
    assert(out.filter($"s" === "a").count() == 200)
  }
}
