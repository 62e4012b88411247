package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional scan
  * pruning: interleave the bits of per-dimension buckets into one
  * sort key, so sorting by it co-locates rows that are close in ALL
  * dimensions at once. Parquet keeps per-row-group min/max stats per
  * column; a file sorted by a single column prunes range filters on
  * that column only, while a Z-sorted file keeps every clustered
  * dimension's min/max tight per row group — a 2-D range filter then
  * skips most row groups (the Delta/Iceberg OPTIMIZE ZORDER design,
  * built here from plain Spark expressions).
  *
  * Bucketing is equal-width over [min, max] per dimension (one
  * bounds aggregate; bounds can be supplied to skip it). Heavy skew
  * concentrates buckets — acceptable for the pruning use (stats
  * stay tight where the data is); rank-based bucketing would need an
  * interpreted HOF lookup per row, the measured-17.9×-tax path this
  * library avoids (SCALE.md).
  *
  * The key is built from `bitwiseOR`/`shiftright` expression nodes —
  * 2·bits codegen'd integer ops per row, no UDF, no shuffle.
  */
object ZOrder {

  /** Morton-interleaved key over `cols` (numeric), `bits` bits per
    * dimension (key width = bits × cols.size ≤ 63). */
  def zOrderKey(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 8,
      bounds: Map[String, (Double, Double)] = Map.empty): Column = {
    require(cols.size >= 2, "zOrderKey: need at least two dimensions")
    require(bits > 0 && bits * cols.size <= 63,
      s"zOrderKey: need bits·dims in (0, 63], got ${bits * cols.size}")
    val nBuckets = 1L << bits
    val bnds: Map[String, (Double, Double)] =
      if (cols.forall(bounds.contains)) bounds
      else {
        val aggs = cols.flatMap(c =>
          Seq(min(col(c).cast("double")).as(s"${c}__lo"),
            max(col(c).cast("double")).as(s"${c}__hi")))
        val r = df.agg(aggs.head, aggs.tail: _*).head()
        cols.zipWithIndex.map { case (c, i) =>
          if (r.isNullAt(2 * i))
            throw new IllegalArgumentException(
              s"zOrderKey: no non-null values in '$c' to derive bounds from; pass bounds explicitly")
          c -> ((r.getDouble(2 * i), r.getDouble(2 * i + 1)))
        }.toMap
      }
    val buckets = cols.map { c =>
      val (lo, hi) = bnds(c)
      val width = math.max((hi - lo) / nBuckets, Double.MinPositiveValue)
      least(greatest(
        floor((col(c).cast("double") - lo) / width).cast("long"), lit(0L)),
        lit(nBuckets - 1))
    }
    // interleave: output bit (i*dims + d) = bit i of dimension d
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      buckets.zipWithIndex.foldLeft(acc) { case (a, (b, d)) =>
        a.bitwiseOR(shiftleft(
          shiftright(b, i).bitwiseAND(lit(1L)), i * cols.size + d))
      }
    }
  }

  /** Write `df` Z-clustered on `cols`: range-partition on the Z key
    * (globally ordered files) and sort within partitions, so row-
    * group min/max stats are tight in every clustered dimension. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      cols: Seq[String],
      bits: Int = 8,
      numFiles: Option[Int] = None): Unit = {
    val z = zOrderKey(df, cols, bits)
    val n = numFiles.getOrElse(df.sparkSession.sparkContext.defaultParallelism)
    df.withColumn("__graft_z", z)
      .repartitionByRange(n, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)
  }
}
