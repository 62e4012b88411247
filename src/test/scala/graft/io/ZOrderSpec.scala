package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("zOrderKey interleaves bits (hand-checked Morton codes)") {
    // 2 dims, bounds [0, 4), bits=2 -> buckets 0..3 of width 1
    val df = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (3.0, 3.0)).toDF("x", "y")
    val z = ZOrder.zOrderKey(df, Seq("x", "y"), bits = 2,
      bounds = Map("x" -> ((0.0, 4.0)), "y" -> ((0.0, 4.0))))
    val out = df.withColumn("z", z).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(2)).toMap
    // morton(x,y) with x at even bits: (0,0)=0, (1,0)=1, (0,1)=2, (3,3)=15
    assert(out((0.0, 0.0)) == 0L)
    assert(out((1.0, 0.0)) == 1L)
    assert(out((0.0, 1.0)) == 2L)
    assert(out((3.0, 3.0)) == 15L)
  }

  test("zOrderKey preserves locality: close points share high bits") {
    val pts = for (x <- 0 until 16; y <- 0 until 16) yield (x.toDouble, y.toDouble)
    val df = pts.toDF("x", "y")
    val z = ZOrder.zOrderKey(df, Seq("x", "y"), bits = 4,
      bounds = Map("x" -> ((0.0, 16.0)), "y" -> ((0.0, 16.0))))
    val m = df.withColumn("z", z).collect()
      .map(r => (r.getDouble(0).toInt, r.getDouble(1).toInt) -> r.getLong(2)).toMap
    // all 256 codes distinct (bijection on the grid)
    assert(m.values.toSet.size == 256)
    // quadrant containment: both coords < 8 <=> z < 64 (top bits 0)
    assert(m.forall { case ((x, y), zv) => (x < 8 && y < 8) == (zv < 64) })
  }

  test("zOrderKey clamps values at the bounds edges") {
    val df = Seq((-5.0, 100.0)).toDF("x", "y")
    val z = ZOrder.zOrderKey(df, Seq("x", "y"), bits = 3,
      bounds = Map("x" -> ((0.0, 8.0)), "y" -> ((0.0, 8.0))))
    val v = df.select(z.as("z")).head().getLong(0)
    // x clamps to bucket 0, y to bucket 7 -> morton(0,7)
    assert(v == 42L) // y bits at odd positions: 7 -> 0b101010
  }

  test("writeZOrdered round-trips all rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val df = (1 to 500).map(i => (i.toDouble, (i * 37 % 500).toDouble)).toDF("a", "b")
    ZOrder.writeZOrdered(df, s"$dir/t", Seq("a", "b"), numFiles = Some(4))
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 500)
    assert(back.agg(sum("a")).head().getDouble(0) == (1 to 500).map(_.toDouble).sum)
  }

  test("zOrderKey on empty input raises a clear error, not NPE") {
    val empty = Seq.empty[(Double, Double)].toDF("a", "b")
    val e = intercept[IllegalArgumentException](ZOrder.zOrderKey(empty, Seq("a", "b")))
    assert(e.getMessage.contains("no non-null values"))
  }
}
