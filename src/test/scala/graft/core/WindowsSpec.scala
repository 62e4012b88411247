package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class WindowsSpec extends SparkTestBase {
  import spark.implicits._

  test("getWindowSpec: partition+order, partition-only, order-only, neither") {
    val d = df("g STRING, o INT, v INT",
      Seq("a", 1, 10), Seq("a", 2, 20), Seq("b", 1, 30))

    val po = d.withColumn("rn",
      row_number().over(Windows.getWindowSpec(Seq("g"), Seq("o"))))
    assert(po.filter($"g" === "a" && $"o" === 2).head().getAs[Int]("rn") == 2)

    val p = d.withColumn("s", sum("v").over(Windows.getWindowSpec(Seq("g"))))
    assert(p.filter($"g" === "a").select("s").as[Long].collect().toSet == Set(30L))

    val o = d.withColumn("rn", row_number().over(Windows.getWindowSpec(orderCols = Seq("v"))))
    assert(o.filter($"v" === 30).head().getAs[Int]("rn") == 3)

    val whole = d.withColumn("s", sum("v").over(Windows.getWindowSpec()))
    assert(whole.select("s").as[Long].head() == 60L)
  }

  test("getWindowSpec reference golden cases: sum over all four spec shapes") {
    // mirrors tests/helpers/test_pyspark.py:406-489 (shop fixture)
    val d = df("code STRING, dt STRING, v INT",
      Seq("oranges", "2022-12-01", 22), Seq("oranges", "2022-12-08", 23),
      Seq("banana", "2022-11-01", 20), Seq("banana", "2022-11-08", 21))
    def sums(part: Seq[String], ord: Seq[String]): Map[(String, String), Long] =
      d.withColumn("t", sum("v").over(Windows.getWindowSpec(part, ord)))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    val both = sums(Seq("code"), Seq("dt"))
    assert(both(("oranges", "2022-12-01")) == 22 && both(("oranges", "2022-12-08")) == 45)
    assert(both(("banana", "2022-11-01")) == 20 && both(("banana", "2022-11-08")) == 41)
    val partOnly = sums(Seq("code"), Nil)
    assert(partOnly(("oranges", "2022-12-01")) == 45 && partOnly(("banana", "2022-11-08")) == 41)
    val ordOnly = sums(Nil, Seq("dt"))
    assert(ordOnly(("banana", "2022-11-01")) == 20 && ordOnly(("oranges", "2022-12-08")) == 86)
    val neither = sums(Nil, Nil)
    assert(neither.values.toSet == Set(86L))
  }

  test("rankNumeric ascending multi-column and descending single-column") {
    val d = df("g STRING, a INT, b INT",
      Seq("x", 1, 2), Seq("x", 1, 1), Seq("x", 2, 0))
    val asc = d.withColumn("r", Windows.rankNumeric(Seq("a", "b"), Seq("g"), ascending = true))
    assert(asc.filter($"a" === 1 && $"b" === 1).head().getAs[Int]("r") == 1)
    val desc = d.withColumn("r", Windows.rankNumeric(Seq("a"), Seq("g")))
    assert(desc.filter($"a" === 2).head().getAs[Int]("r") == 1)
  }

  test("rankNumeric rejects descending with multiple columns (reference rule)") {
    assertThrows[IllegalArgumentException](
      Windows.rankNumeric(Seq("a", "b"), Seq("g"), ascending = false))
  }

  test("calcMedianPrice computes grouped median") {
    val d = df("g STRING, price DOUBLE",
      Seq("a", 1.0), Seq("a", 2.0), Seq("a", 9.0), Seq("b", 5.0))
    val out = d.withColumn("m", Windows.calcMedianPrice(Seq("g")))
      .select("g", "m").distinct()
    val got = out.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == Map("a" -> 2.0, "b" -> 5.0))
  }
}
