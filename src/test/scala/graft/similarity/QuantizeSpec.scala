package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(1.0, -2.0, 0.5)),
    (2L, Seq(0.0, 0.0, 0.0)),   // zero vector
    (3L, Seq(127.0))            // scale exactly 1
  ).toDF("id", "v")

  test("quantizeInt8 codes lie in [-127, 127] with scale = max|x|/127") {
    val q = Quantize.quantizeInt8(vecs, "v")
      .select($"id", $"scale", $"qvec").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getSeq[Int](2)))).toMap
    assert(q(1L)._1 == 2.0 / 127.0)
    assert(q(1L)._2 == Seq(64, -127, 32)) // round(1/(2/127)) = round(63.5) = 64
    assert(q(2L) == ((0.0, Seq(0, 0, 0))))
    assert(q(3L) == ((1.0, Seq(127))))
  }

  test("dequantizeInt8 reconstructs within scale/2 per component") {
    val rt = Quantize.quantizeInt8(vecs.filter($"id" === 1), "v")
      .withColumn("back", Quantize.dequantizeInt8($"qvec", $"scale"))
      .select($"v", $"back", $"scale").head()
    val (orig, back, scale) =
      (rt.getSeq[Double](0), rt.getSeq[Double](1), rt.getDouble(2))
    orig.zip(back).foreach { case (o, b) =>
      assert(math.abs(o - b) <= scale / 2 + 1e-12, s"$o vs $b")
    }
  }

  test("quantizeInt8 rejects a clashing working column") {
    assertThrows[IllegalArgumentException](
      Quantize.quantizeInt8(vecs.withColumnRenamed("id", "__quant_dv"), "v"))
  }
}
