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

  /** Distinct non-null values / non-null rows must equal 1.0.
    *
    * `exact = true` computes a true `count_distinct` — Spark executes
    * it as a grouped pre-aggregation on `column`, i.e. a shuffle of one
    * row per distinct value. The compiler therefore gives each exact
    * uniqueness check its OWN narrow pass (see [[run]]): folding it
    * into the shared aggregation would drag every other metric's
    * buffer through that per-distinct-value exchange (measured 29.5 MB
    * vs 11.1 MB shuffle on the SCALE.md expectations_passes row).
    * `exact = false` uses HyperLogLog++ (`approx_count_distinct`,
    * relative error `rsd`) which stays inside the shared single pass —
    * the 100 TB default when "is this column a key" tolerates ~2 %
    * error. */
  final case class ExpectUnique(
      column: String, exact: Boolean = true, rsd: Double = 0.02)
      extends Expectation { val name = "unique" }

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

  /** Compile the suite into the minimal number of passes. Returns one
    * row per expectation: `check` (name), `column`, `metric` (rounded
    * 6 dp), `passed`.
    *
    * Pass plan: every metric except exact uniqueness is a narrow
    * aggregate (counter-width shuffle) — they all share ONE scan. Each
    * exact [[ExpectUnique]] column gets its OWN pass carrying only the
    * `count_distinct` buffers, because the grouped pre-aggregation
    * Spark uses for exact distinct shuffles one row per distinct value
    * and must not be widened by unrelated metric buffers. Total scans:
    * 1 + (distinct exact-unique columns); 1 when the suite has none
    * (or uses `exact = false`). Row order: shared-pass rows first (in
    * suite order), then exact-unique rows. */
  def run(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "Expectations.run: empty suite")
    val needed = expectations.map(_.column).filter(_ != "*").distinct
    val missing = needed.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw new ColumnNotInDataframeError(
        s"Expectations.run: column(s) ${missing.mkString(", ")} not in dataframe")

    val (exactUniques, shared) = expectations.partition {
      case ExpectUnique(_, true, _) => true
      case _                        => false
    }
    val frames =
      (if (shared.nonEmpty) Seq(compile(df, shared)) else Nil) ++
        exactUniques.groupBy(_.column).toSeq.sortBy(_._1)
          .map { case (_, es) => compile(df, es) }
    frames.reduce(_.union(_))
  }

  /** One aggregation pass over `df` for `expectations`. */
  private def compile(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
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
          case ExpectUnique(c, exact, rsd) =>
            val dc = if (exact) countDistinct(col(c))
                     else approx_count_distinct(col(c), rsd)
            when(count(col(c)) === 0, 1.0)
              .otherwise(dc.cast("double") / count(col(c)).cast("double"))
          case ExpectBetween(c, lo, hi, _) =>
            fracNonNull(c, col(c).cast("double").between(lo, hi))
          case ExpectMatches(c, re, _) => fracNonNull(c, col(c).rlike(re))
          case ExpectInSet(c, vs, _)   => fracNonNull(c, col(c).isin(vs: _*))
          case ExpectMinRows(_)        => n
          case ExpectMeanBetween(c, _, _) => avg(col(c).cast("double"))
        }
        round(m, 6).as(s"__m$i")
    }
    // Exact uniqueness must NOT be judged from the 6-dp-rounded ratio: at
    // ~2M+ rows a handful of duplicates rounds to 1.0 and the check would
    // silently pass. Compute the verdict in-aggregate as an exact long
    // comparison; the rounded ratio stays as the REPORTED metric only.
    // Catalyst shares the countDistinct buffer with the metric expression.
    val passExprs: Seq[Column] = expectations.zipWithIndex.collect {
      case (ExpectUnique(c, true, _), i) =>
        (count(col(c)) === 0 || countDistinct(col(c)) === count(col(c)))
          .as(s"__p$i")
    }
    val one = df.agg((metricExprs ++ passExprs).head,
      (metricExprs ++ passExprs).tail: _*)
    val rows = expectations.zipWithIndex.map { case (e, i) =>
      val m = col(s"__m$i")
      val passed = e match {
        case ExpectNotNull(_, t)      => m >= t
        case u: ExpectUnique          =>
          // approx distinct can legitimately read slightly over 1.0
          if (u.exact) col(s"__p$i") else m >= 1.0 - u.rsd
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
