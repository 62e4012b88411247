package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ProjectionSpec extends SparkTestBase {
  import spark.implicits._

  test("md5 uniforms are deterministic and in (0, 1]") {
    val us = (0 until 1000).map(i => Projection.md5Uniform(s"s:$i"))
    assert(us.forall(u => u > 0.0 && u <= 1.0))
    assert(Projection.md5Uniform("s:7") == Projection.md5Uniform("s:7"))
    assert(Projection.md5Uniform("s:7") != Projection.md5Uniform("s:8"))
  }

  test("projection matrix is seed-deterministic, ~N(0, 1/outDim)") {
    val r1 = Projection.projectionMatrix("seed", 8, 32)
    val r2 = Projection.projectionMatrix("seed", 8, 32)
    assert(r1.toSeq == r2.toSeq)
    assert(Projection.projectionMatrix("other", 8, 32).toSeq != r1.toSeq)
    val n = r1.length.toDouble
    val mean = r1.sum / n
    val varc = r1.map(x => (x - mean) * (x - mean)).sum / n
    assert(math.abs(mean) < 0.05, s"mean $mean")
    assert(math.abs(varc - 1.0 / 8) < 0.02, s"var $varc vs ${1.0 / 8}")
  }

  test("randomProject computes R*v exactly; float and double inputs agree") {
    val vd = Seq((1L, Seq(1.0, 0.0, 2.0, -1.0))).toDF("id", "v")
    val out = Projection.randomProject(vd, "v", "p", 4, 2, "s")
      .select("p").as[Seq[Double]].head()
    val r = Projection.projectionMatrix("s", 2, 4)
    val exp = Seq(
      r(0) * 1.0 + r(2) * 2.0 + r(3) * -1.0,
      r(4) * 1.0 + r(6) * 2.0 + r(7) * -1.0)
    assert(out.zip(exp).forall { case (a, b) => math.abs(a - b) < 1e-12 })

    val vf = Seq((1L, Seq(1.0f, 0.0f, 2.0f, -1.0f))).toDF("id", "v")
    val outF = Projection.randomProject(vf, "v", "p", 4, 2, "s")
      .select("p").as[Seq[Double]].head()
    assert(outF.zip(exp).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("JL property: pairwise cosine survives 64 -> 16 on a planted fixture") {
    val rnd = new scala.util.Random(3)
    val base = Array.fill(64)(rnd.nextGaussian())
    def jitter(eps: Double) = base.zipWithIndex.map { case (x, _) => x + eps * rnd.nextGaussian() }
    val rows = (0 until 40).map(i => (i.toLong, jitter(if (i < 20) 0.05 else 5.0).toSeq))
    val df = rows.toDF("id", "v")
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val proj = Projection.randomProject(df, "v", "p", 64, 16, "jl")
      .select("id", "p").as[(Long, Seq[Double])].collect().toMap
    // near-copies of the base vector stay mutually closer in projected
    // space than the far (heavily jittered) points on average
    val nearIds = (0L until 20L)
    val farIds = (20L until 40L)
    val nearCos = (for (a <- nearIds; b <- nearIds if a < b) yield cos(proj(a), proj(b)))
    val farCos = (for (a <- nearIds; b <- farIds) yield cos(proj(a), proj(b)))
    assert(nearCos.sum / nearCos.size > farCos.sum / farCos.size + 0.2)
  }

  test("null vector elements count zero; matrix bound enforced") {
    val df = spark.sql("SELECT CAST(array(1.0, NULL, 2.0) AS array<double>) AS v")
    val r = Projection.projectionMatrix("s", 1, 3)
    val got = Projection.randomProject(df, "v", "p", 3, 1, "s")
      .select("p").collect().head.getSeq[Double](0)
    assert(math.abs(got.head - (r(0) * 1.0 + r(2) * 2.0)) < 1e-12)
    assertThrows[IllegalArgumentException](
      Projection.projectionMatrix("s", 4001, 4001))
  }
}
