package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ColumnNotInDataframeError

/** Categorical feature encoders for training-data pipelines:
  * frequency encoding and smoothed target (mean) encoding.
  *
  * Scale shape — both are the imputeNulls pattern, NOT windows: a
  * grouped aggregation reduces the corpus to category cardinality,
  * and the category-sized frame joins back (AQE broadcasts it). The
  * window formulation (`count(*) over (partition by cat)`) shuffles
  * every corpus row into one task per category value and dies on
  * low-cardinality columns; the grouped-agg form's exchanges carry
  * only category counts.
  */
object Encode {

  private def check(df: DataFrame, cols: Seq[String], what: String): Unit = {
    val missing = cols.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw new ColumnNotInDataframeError(
        s"$what: column(s) ${missing.mkString(", ")} not in dataframe " +
          s"(has: ${df.columns.mkString(", ")})")
  }

  /** Add `<col>_freq` for each of `cols`: the category's row count
    * (`normalize = true`: its fraction of all rows, rounded 9 dp).
    * Null categories form their own group (null is a real level in
    * corpus metadata — dropping it would silently unweight rows).
    * One grouped agg + one join per column; independent columns, so
    * the joins chain without interacting. */
  def frequencyEncode(
      df: DataFrame,
      cols: Seq[String],
      normalize: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "frequencyEncode: need at least one column")
    check(df, cols, "frequencyEncode")
    lazy val total = df.count().toDouble
    cols.foldLeft(df) { (acc, c) =>
      val outCol = s"${c}_freq"
      val counts = df.groupBy(col(c).as("__graft_cat"))
        .agg(count(lit(1)).as("__graft_n"))
      // explicit broadcast, not AQE: AQE's SMJ→BHJ conversion still
      // WRITES the corpus's map-side shuffle before converting
      // (measured in SCALE.md encode_path); the category side is
      // small by the op's nature, so plan the broadcast up front
      val joined = acc
        .join(broadcast(counts), acc.col(c) <=> counts.col("__graft_cat"), "left")
        .drop("__graft_cat")
      if (normalize)
        joined.withColumn(outCol, round(col("__graft_n") / total, 9))
          .drop("__graft_n")
      else joined.withColumn(outCol, col("__graft_n")).drop("__graft_n")
    }
  }

  /** Add `<catCol>_enc`: the smoothed per-category mean of
    * `targetCol`, `(sum_cat + m · globalMean) / (n_cat + m)` (rounded
    * 6 dp) — the standard leakage-damped target encoding where `m`
    * (`smoothing`) is the pseudo-count pulling rare categories toward
    * the global mean. Null targets don't contribute to either mean;
    * null categories are their own level. Global mean is a 1-row
    * aggregate broadcast over the corpus; category stats join back at
    * category cardinality. */
  def targetEncode(
      df: DataFrame,
      catCol: String,
      targetCol: String,
      smoothing: Double = 20.0): DataFrame = {
    require(smoothing >= 0.0,
      s"targetEncode: smoothing must be >= 0, got $smoothing")
    check(df, Seq(catCol, targetCol), "targetEncode")
    val t = col(targetCol).cast("double")
    val global = df.agg(avg(t).as("__graft_gmean"))
    val stats = df.groupBy(col(catCol).as("__graft_cat"))
      .agg(sum(t).as("__graft_sum"), count(t).as("__graft_cnt"))
    val enc = df
      .crossJoin(broadcast(global))
      .join(broadcast(stats), df.col(catCol) <=> stats.col("__graft_cat"), "left")
      .drop("__graft_cat")
    enc.withColumn(s"${catCol}_enc",
        round((coalesce(col("__graft_sum"), lit(0.0)) +
          lit(smoothing) * col("__graft_gmean")) /
          (coalesce(col("__graft_cnt"), lit(0L)) + lit(smoothing)), 6))
      .drop("__graft_gmean", "__graft_sum", "__graft_cnt")
  }
}
