package graft.checks

import graft.SparkTestBase
import graft.checks.Expectations._
import org.apache.spark.sql.Row

class ExpectationsSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    ("a", 1, "X1"), ("b", 2, "X2"), ("c", 3, "X3"),
    ("d", 4, "Y4"), (null, 5, "X5")).toDF("s", "n", "code")

  test("run computes every metric in one pass, long-format") {
    val out = Expectations.run(df, Seq(
      ExpectNotNull("s"),
      ExpectUnique("n"),
      ExpectBetween("n", 1, 4),
      ExpectMatches("code", "^X"),
      ExpectInSet("s", Seq("a", "b", "c", "d")),
      ExpectMinRows(3),
      ExpectMeanBetween("n", 2.5, 3.5))).collect()
    assert(out.length == 7)
    val byCheck = out.map(r => (r.getString(0), r.getString(1)) ->
      (r.getDouble(2), r.getBoolean(3))).toMap
    assert(byCheck(("not_null", "s")) == (0.8, false))
    assert(byCheck(("unique", "n")) == (1.0, true))
    assert(byCheck(("between", "n")) == (0.8, false))
    assert(byCheck(("matches", "code")) == (0.8, false))
    // in_set is over NON-NULL values only: 4/4
    assert(byCheck(("in_set", "s")) == (1.0, true))
    assert(byCheck(("min_rows", "*")) == (5.0, true))
    assert(byCheck(("mean_between", "n")) == (3.0, true))
  }

  test("suite without exact-unique is ONE aggregation pass (single scan)") {
    val suite = Seq(ExpectNotNull("s"), ExpectUnique("n", exact = false),
      ExpectBetween("n", 0, 10), ExpectMinRows(1))
    val plan = Expectations.run(df, suite).queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("LocalTableScan"))
    assert(scans == 1, s"expected one scan for 4 constraints, got $scans:\n$plan")
  }

  test("exact-unique gets its own narrow pass, not folded into the shared agg") {
    val suite = Seq(ExpectNotNull("s"), ExpectUnique("n"),
      ExpectBetween("n", 0, 10), ExpectMinRows(1))
    val plan = Expectations.run(df, suite).queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("LocalTableScan"))
    assert(scans == 2, s"expected shared pass + distinct pass, got $scans:\n$plan")
    // the shared pass must NOT contain a grouped pre-aggregation: the
    // only keyed HashAggregates allowed are the distinct pass's own
    val keyedAggs = plan.linesIterator
      .count(l => l.contains("HashAggregate(keys=[n#") && !l.contains("keys=[]"))
    assert(keyedAggs <= 2, s"narrow metrics leaked into the distinct exchange:\n$plan")
    // approx variant of the same suite collapses back to one scan
    val approxPlan = Expectations.run(df,
      suite.map { case u: ExpectUnique => u.copy(exact = false); case e => e })
      .queryExecution.executedPlan.toString
    assert(approxPlan.linesIterator.count(_.contains("LocalTableScan")) == 1)
  }

  test("approx unique agrees with exact on key-like and duplicated columns") {
    val keys = (1 to 500).map(i => (i, i % 50)).toDF("k", "dup")
    val out = Expectations.run(keys, Seq(
      ExpectUnique("k", exact = false), ExpectUnique("dup", exact = false)))
      .collect().map(r => r.getString(1) -> r.getBoolean(3)).toMap
    assert(out("k"), "HLL should pass a true key within rsd")
    assert(!out("dup"), "10x duplication must fail even approximately")
  }

  test("empty / all-null columns are vacuously satisfied, count still real") {
    val empty = Seq.empty[(String, Int)].toDF("s", "n")
    val out = Expectations.run(empty, Seq(ExpectNotNull("s"), ExpectBetween("n", 0, 1),
      ExpectUnique("n"), ExpectMinRows(1))).collect()
    val byCheck = out.map(r => r.getString(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(byCheck("not_null") == (1.0, true))
    assert(byCheck("between") == (1.0, true))
    assert(byCheck("unique") == (1.0, true))
    assert(byCheck("min_rows") == (0.0, false))
  }

  test("thresholds relax fraction checks") {
    val out = Expectations.run(df, Seq(ExpectNotNull("s", threshold = 0.75),
      ExpectMatches("code", "^X", threshold = 0.5))).collect()
    assert(out.forall(_.getBoolean(3)))
  }

  test("validate and requireValid surface failures") {
    val (ok, failures) = validate(df, Seq(ExpectNotNull("s"), ExpectUnique("n")))
    assert(!ok && failures == Seq("not_null(s)=0.8"))
    intercept[graft.PipelineError] {
      requireValid(df, Seq(ExpectNotNull("s")))
    }
    requireValid(df, Seq(ExpectUnique("n")))
  }

  test("unknown column names the column") {
    val e = intercept[graft.ColumnNotInDataframeError](
      Expectations.run(df, Seq(ExpectNotNull("zzz"))))
    assert(e.getMessage.contains("zzz"))
  }

  test("exact uniqueness is judged unrounded: one duplicate in 2M rows fails") {
    // 2M rows with a single duplicated key: the ratio 1999999/2000000
    // rounds to 1.0 at 6 dp — the verdict must come from the exact
    // countDistinct === count comparison, not the reported metric
    val big = spark.range(2000000L)
      .selectExpr("CASE WHEN id = 1999999 THEN 0 ELSE id END AS k")
    val out = Expectations.run(big, Seq(ExpectUnique("k", exact = true))).head()
    assert(out.getDouble(2) == 1.0)      // reported metric DOES round to 1.0
    assert(!out.getBoolean(3))           // ... but the check still fails
    val clean = Expectations.run(spark.range(2000000L).toDF("k"),
      Seq(ExpectUnique("k", exact = true))).head()
    assert(clean.getBoolean(3))
  }
}
