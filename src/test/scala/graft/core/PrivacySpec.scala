package graft.core

import graft.SparkTestBase

class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  // (age_band, zip, diagnosis): class (30s, 111) has 3 rows / 2 values,
  // (40s, 222) has 2 rows / 2 values, (50s, 333) is a singleton
  private def df = Seq(
    ("30s", 111, "flu"), ("30s", 111, "flu"), ("30s", 111, "cold"),
    ("40s", 222, "flu"), ("40s", 222, "cold"),
    ("50s", 333, "rare")).toDF("age_band", "zip", "diagnosis")

  test("anonymityClasses: k per class, l with sensitive column") {
    val got = Privacy.anonymityClasses(df, Seq("age_band", "zip"), Some("diagnosis"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(("30s", 3L, 2L), ("40s", 2L, 2L), ("50s", 1L, 1L)))
  }

  test("kAnonymityReport: dataset k, violations, suppression fraction") {
    val r = Privacy.kAnonymityReport(df, Seq("age_band", "zip"), minK = 3).head()
    assert(r.getAs[Long]("dataset_k") == 1L)
    assert(r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("violating_classes") == 2L)
    assert(r.getAs[Long]("violating_rows") == 3L)
    assert(r.getAs[Double]("suppression_frac") == 0.5)
  }

  test("suppressSmallClasses drops exactly the sub-k rows, schema intact") {
    val kept = Privacy.suppressSmallClasses(df, Seq("age_band", "zip"), minK = 2)
    assert(kept.columns.toSeq == df.columns.toSeq)
    assert(kept.count() == 5L)
    assert(kept.filter($"age_band" === "50s").count() == 0L)
    // resulting release is k-anonymous at 2
    val k = Privacy.kAnonymityReport(kept, Seq("age_band", "zip"), 2)
      .head().getAs[Long]("dataset_k")
    assert(k >= 2L)
  }

  test("pseudonymize: keyed, deterministic, null-safe, join-stable") {
    val df = Seq((1L, "alice", "555"), (2L, "bob", null), (3L, "alice", "777"))
      .toDF("id", "name", "phone")
    val out = Privacy.pseudonymize(df, Seq("name", "phone"), "secret")
      .collect().map(r => (r.getLong(0),
        r.getString(1), Option(r.getString(2)))).toList
    // same value -> same pseudonym (rows 1 and 3); nulls stay null
    assert(out(0)._2 == out(2)._2 && out(0)._2 != "alice")
    assert(out(0)._2.matches("[0-9a-f]{64}"))
    assert(out(1)._3.isEmpty)
    // different secret unlinks
    val other = Privacy.pseudonymize(df, Seq("name"), "rotated")
      .collect().head.getString(1)
    assert(other != out(0)._2)
    assertThrows[IllegalArgumentException](Privacy.pseudonymize(df, Nil, "s"))
    assertThrows[IllegalArgumentException](Privacy.pseudonymize(df, Seq("name"), ""))
  }

  test("lDiversityViolations: homogeneous classes surface, diverse ones don't") {
    // (30s,111) has 2 distinct diagnoses -> ok at minL=2;
    // add a homogeneous class (60s, 444, flu x2) -> violates
    val d2 = df.union(Seq(("60s", 444, "flu"), ("60s", 444, "flu"))
      .toDF("age_band", "zip", "diagnosis"))
    val bad = Privacy.lDiversityViolations(d2, Seq("age_band", "zip"), "diagnosis", 2)
    val badKeys = bad.select("age_band").distinct().as[String].collect().toSet
    // 50s singleton (1 value) and 60s homogeneous both violate
    assert(badKeys == Set("50s", "60s"))
    assert(bad.count() == 3L) // 1 + 2 rows
  }

  test("all-unique quasi identifiers: full suppression is reported, not hidden") {
    val df = (1 to 6).map(i => (s"id$i", s"zip$i", i)).toDF("id", "zip", "v")
    // every class is a singleton: the minimal k-anonymous release at
    // minK=2 is EMPTY, and the report must say so loudly
    assert(Privacy.suppressSmallClasses(df, Seq("id", "zip"), 2).count() == 0)
    val rep = Privacy.kAnonymityReport(df, Seq("id", "zip"), 2).head()
    assert(rep.getAs[Long]("dataset_k") == 1L)
    assert(rep.getAs[Long]("violating_classes") == 6L)
    assert(rep.getAs[Double]("suppression_frac") == 1.0)
  }

  test("null quasi values form a class; l-diversity violations include it") {
    val df = Seq(
      (Option("z1"), "flu"), (Option("z1"), "cold"),
      (Option.empty[String], "flu"), (Option.empty[String], "flu"))
      .toDF("zip", "diag")
    // null-zip class has l=1 < 2 — an equality semi join would let it
    // escape the worklist silently
    val bad = Privacy.lDiversityViolations(df, Seq("zip"), "diag", 2)
    assert(bad.count() == 2 && bad.collect().forall(_.isNullAt(0)))
    // suppression counts the null class like any other (k=2 survives)
    assert(Privacy.suppressSmallClasses(df, Seq("zip"), 2).count() == 4)
  }
}
