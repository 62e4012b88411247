package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ColumnNotInDataframeError

/** Declarative data-quality expectation suite, deequ-style: a set of
  * constraints over a table is compiled into ONE aggregation pass and
  * reported as a long-format result `(check, column, metric, passed)`.
  *
  * Scale shape — the whole point of the design: N constraints cost ONE
  * scan of the table, not N. Every metric is an aggregate expression
  * (conditional counts/averages, `count_distinct`) folded into a single
  * `df.agg(...)`; Spark computes them with partial + final hash
  * aggregation (bytes shuffled = one row per partition), and multiple
  * distinct-aggregates share the scan via the Expand operator. At
  * 100 TB the alternative — one job per constraint, the naive
  * validation-framework shape — re-reads the corpus N times; this
  * reads it once. The long-format explode of the single result row is
  * driver-scale work.
  *
  * Extends the reference's eager single-metric probes
  * (rdsa_utils/helpers/pyspark.py:1054-1171 — null counts, scalar
  * aggregates, distinct checks) into a composable suite; the eager
  * `validate`/`requireValid` wrappers keep the reference's
  * throw-on-violation ergonomics.
  */
object Expectations {

  /** One declarative constraint. `name` keys the result row; `column`
    * is reported alongside (synthetic for table-level checks). */
  sealed trait Expectation {
    def name: String
    def column: String
  }

  /** Fraction of rows with `column` non-null must be >= `threshold`. */
  final case class ExpectNotNull(column: String, threshold: Double = 1.0)
      extends Expectation { val name = "not_null" }

  /** Distinct non-null values / non-null rows must equal 1.0 (exact). */
  final case class ExpectUnique(column: String) extends Expectation {
    val name = "unique"
  }

  /** Fraction of NON-NULL values inside [lo, hi] must be >= `threshold`
    * (nulls are the not_null check's business, not this one's). */
  final case class ExpectBetween(
      column: String, lo: Double, hi: Double, threshold: Double = 1.0)
      extends Expectation { val name = "between" }

  /** Fraction of non-null values matching `regex` (unanchored, Java
    * syntax — anchor explicitly) must be >= `threshold`. */
  final case class ExpectMatches(
      column: String, regex: String, threshold: Double = 1.0)
      extends Expectation { val name = "matches" }

  /** Fraction of non-null values in `values` must be >= `threshold`. */
  final case class ExpectInSet(
      column: String, values: Seq[String], threshold: Double = 1.0)
      extends Expectation { val name = "in_set" }

  /** Table row count must be >= `minRows`. Metric is the count. */
  final case class ExpectMinRows(minRows: Long) extends Expectation {
    val name = "min_rows"; val column = "*"
  }

  /** Column mean must lie in [lo, hi]. Metric is the mean. */
  final case class ExpectMeanBetween(column: String, lo: Double, hi: Double)
      extends Expectation { val name = "mean_between" }

  /** Compile the suite into one aggregation pass. Returns one row per
    * expectation: `check` (name), `column`, `metric` (rounded 6 dp),
    * `passed`. Row order follows `expectations`. */
  def run(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "Expectations.run: empty suite")
    val needed = expectations.map(_.column).filter(_ != "*").distinct
    val missing = needed.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw new ColumnNotInDataframeError(
        s"Expectations.run: column(s) ${missing.mkString(", ")} not in dataframe")

    val n = count(lit(1)).cast("double")
    // Fraction-of-non-null metrics divide by count(col); on an empty or
    // all-null column the denominator is 0 — define the metric as 1.0
    // (vacuously satisfied) rather than null so `passed` stays boolean.
    def fracNonNull(c: String, pred: Column): Column = {
      val nn = count(col(c)).cast("double")
      when(nn === 0.0, 1.0)
        .otherwise(sum(when(col(c).isNotNull && pred, 1.0).otherwise(0.0)) / nn)
    }
    val metricExprs: Seq[Column] = expectations.zipWithIndex.map {
      case (e, i) =>
        val m = e match {
          case ExpectNotNull(c, _) =>
            when(n === 0.0, 1.0).otherwise(count(col(c)).cast("double") / n)
          case ExpectUnique(c) =>
            when(count(col(c)) === 0, 1.0)
              .otherwise(countDistinct(col(c)).cast("double") /
                count(col(c)).cast("double"))
          case ExpectBetween(c, lo, hi, _) =>
            fracNonNull(c, col(c).cast("double").between(lo, hi))
          case ExpectMatches(c, re, _) => fracNonNull(c, col(c).rlike(re))
          case ExpectInSet(c, vs, _)   => fracNonNull(c, col(c).isin(vs: _*))
          case ExpectMinRows(_)        => n
          case ExpectMeanBetween(c, _, _) => avg(col(c).cast("double"))
        }
        round(m, 6).as(s"__m$i")
    }
    val one = df.agg(metricExprs.head, metricExprs.tail: _*)
    val rows = expectations.zipWithIndex.map { case (e, i) =>
      val m = col(s"__m$i")
      val passed = e match {
        case ExpectNotNull(_, t)      => m >= t
        case ExpectUnique(_)          => m === 1.0
        case ExpectBetween(_, _, _, t) => m >= t
        case ExpectMatches(_, _, t)   => m >= t
        case ExpectInSet(_, _, t)     => m >= t
        case ExpectMinRows(k)         => m >= k.toDouble
        case ExpectMeanBetween(_, lo, hi) => m.between(lo, hi)
      }
      struct(lit(e.name).as("check"), lit(e.column).as("column"),
        m.as("metric"), passed.as("passed"))
    }
    one.select(inline(array(rows: _*)))
  }

  /** Eager wrapper: run the suite, collect the (suite-sized) report,
    * return (allPassed, failures as "check(column)=metric"). */
  def validate(
      df: DataFrame,
      expectations: Seq[Expectation]): (Boolean, Seq[String]) = {
    val failures = run(df, expectations).collect().toSeq
      .filterNot(_.getAs[Boolean]("passed"))
      .map(r => s"${r.getAs[String]("check")}(${r.getAs[String]("column")})=" +
        r.getAs[Double]("metric"))
    (failures.isEmpty, failures)
  }

  /** Throwing variant, the reference's check ergonomics: raises
    * [[graft.PipelineError]] listing every failed expectation. */
  def requireValid(df: DataFrame, expectations: Seq[Expectation]): Unit = {
    val (ok, failures) = validate(df, expectations)
    if (!ok)
      throw new graft.PipelineError(
        s"expectation suite failed: ${failures.mkString("; ")}")
  }
}
