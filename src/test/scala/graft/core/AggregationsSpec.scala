package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AggregationsSpec extends SparkTestBase {
  import spark.implicits._

  private def sales = df("region STRING, product STRING, amount DOUBLE",
    Seq("e", "a", 10.0), Seq("e", "b", 20.0), Seq("w", "a", 30.0))

  test("groupedAgg names outputs; empty aggs rejected") {
    val out = Aggregations.groupedAgg(sales, Seq("region"),
      Seq("total" -> sum("amount"), "n" -> count(lit(1))))
    assert(out.columns.toSeq == Seq("region", "total", "n"))
    assert(out.filter($"region" === "e").head().getDouble(1) == 30.0)
    assertThrows[IllegalArgumentException](
      Aggregations.groupedAgg(sales, Seq("region"), Nil))
  }

  test("cubeAgg emits all grouping sets, rollupAgg prefix sets") {
    val cube = Aggregations.cubeAgg(sales, Seq("region", "product"),
      Seq("total" -> sum("amount")))
    assert(cube.count() == 3 + 2 + 2 + 1) // cells + region + product + grand
    val rollup = Aggregations.rollupAgg(sales, Seq("region", "product"),
      Seq("total" -> sum("amount")))
    assert(rollup.count() == 3 + 2 + 1)   // no product-only sets
    val grand = cube.filter($"region".isNull && $"product".isNull)
    assert(grand.head().getDouble(2) == 60.0)
  }

  test("distinctCount exact and approxDistinctCount sketch") {
    val exact = Aggregations.distinctCount(sales, Seq("region"), "product")
    assert(exact.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("e" -> 2L, "w" -> 1L))
    val approx = Aggregations.approxDistinctCount(sales, Seq("region"), "product")
    // tiny cardinalities: HLL++ is exact here
    assert(approx.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("e" -> 2L, "w" -> 1L))
  }

  test("percentiles: exact interpolating quantiles per group; validates ps") {
    val d = df("g STRING, v DOUBLE",
      Seq("a", 1.0), Seq("a", 2.0), Seq("a", 3.0), Seq("a", 4.0))
    val out = Aggregations.percentiles(d, Seq("g"), "v", Seq(0.5), exact = true)
    assert(out.columns.toSeq == Seq("g", "p50"))
    assert(out.head().getDouble(1) == 2.5) // interpolated median of 1..4
    val approx = Aggregations.percentiles(d, Seq("g"), "v", Seq(0.5))
    assert(Seq(2.0, 3.0).contains(approx.head().getDouble(1))) // element-valued
    assertThrows[IllegalArgumentException](
      Aggregations.percentiles(d, Seq("g"), "v", Seq(1.5)))
  }

  test("intersectDfs / exceptDfs set semantics") {
    val a = Seq(1, 2, 2, 3).toDF("x")
    val b = Seq(2, 3, 4).toDF("x")
    assert(DataFrameOps.intersectDfs(a, b).as[Int].collect().sorted.toSeq == Seq(2, 3))
    assert(DataFrameOps.exceptDfs(a, b).as[Int].collect().toSeq == Seq(1))
  }

  test("joinMultiDfsFill outer-joins then fills") {
    // Seq[Any] stops Scala widening the Int key to Double
    val d1 = df("k INT, a DOUBLE", Seq[Any](1, 1.5), Seq[Any](2, 2.5))
    val d2 = df("k INT, b STRING", Seq[Any](1, "x"))
    val out = DataFrameOps.joinMultiDfsFill(Seq(d1, d2), Seq("k"), "outer",
      fillNumeric = Some(0.0), fillString = Some("missing"))
    val r2 = out.filter($"k" === 2).head()
    assert(r2.getString(2) == "missing")
  }

  test("saltedJoin equals plain join on every join type it allows") {
    val big = spark.range(1000).toDF("k")
      .withColumn("k", col("k") % 3) // 3 hot keys
      .withColumn("v", col("k") * 10)
    val dim = df("k BIGINT, name STRING",
      Seq(0L, "zero"), Seq(1L, "one"), Seq(99L, "unmatched"))
    val plain = big.join(dim, Seq("k"), "inner")
    // right pinned to the shuffle path so the salting machinery actually
    // engages (a broadcastable un-hinted right short-circuits — below)
    val salted = DataFrameOps.saltedJoin(
      big, dim.hint("merge"), Seq("k"), "inner", saltFactor = 4)
    assert(salted.count() == plain.count())
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.queryExecution.analyzed.toString.contains("__graft_salt"),
      "merge-hinted right must take the salted path")
    assert(salted.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      plain.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    assertThrows[IllegalArgumentException](
      DataFrameOps.saltedJoin(big, dim, Seq("k"), saltFactor = 0))
  }

  test("saltedJoin defers to the plain join when the right side broadcasts") {
    val big = spark.range(1000).toDF("k").withColumn("k", col("k") % 3)
    val dim = df("k BIGINT, name STRING", Seq(0L, "zero"), Seq(1L, "one"))
    // un-hinted small right: Catalyst will broadcast, so there is no
    // reduce side to skew — the operator must not pay the ×salt build
    val out = DataFrameOps.saltedJoin(big, dim, Seq("k"), saltFactor = 8)
    assert(!out.queryExecution.analyzed.toString.contains("__graft_salt"),
      "broadcastable right must short-circuit to the plain join")
    assert(out.count() == big.join(dim, Seq("k")).count())
    // saltFactor=1 is degenerate salting: also the plain join
    val one = DataFrameOps.saltedJoin(big, dim.hint("merge"), Seq("k"), saltFactor = 1)
    assert(!one.queryExecution.analyzed.toString.contains("__graft_salt"))
  }

  test("saltedJoin hotKeys does not disable the broadcast short-circuit") {
    // targeting changes WHAT is replicated, not whether salting is
    // worth engaging: a broadcastable un-hinted right must still
    // short-circuit even when hot keys are passed
    val big = spark.range(1000).toDF("k").withColumn("k", col("k") % 3)
    val dim = df("k BIGINT, name STRING", Seq(0L, "zero"), Seq(1L, "one"))
    val out = DataFrameOps.saltedJoin(
      big, dim, Seq("k"), saltFactor = 8, hotKeys = Some(Seq(0L)))
    assert(!out.queryExecution.analyzed.toString.contains("__graft_salt"),
      "broadcastable right + hotKeys must short-circuit to the plain join")
    assert(out.count() == big.join(dim, Seq("k")).count())
  }

  test("saltedJoin engages when broadcast is disabled session-wide") {
    // threshold -1 means no broadcast join exists to defer to: the
    // short-circuit must stand down even for a small un-hinted right
    val big = spark.range(1000).toDF("k").withColumn("k", col("k") % 3)
    val dim = df("k BIGINT, name STRING", Seq(0L, "zero"), Seq(1L, "one"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val salted = DataFrameOps.saltedJoin(big, dim, Seq("k"), saltFactor = 4)
      assert(salted.queryExecution.analyzed.toString.contains("__graft_salt"),
        "broadcast disabled: salting must engage")
      assert(salted.count() == big.join(dim, Seq("k")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("detectHotKeys finds the skewed key and composes with saltedJoin") {
    val big = spark.range(2000).toDF("k")
      .withColumn("k", when(col("k") < 1800, lit(9L)).otherwise(col("k")))
      .withColumn("v", col("k") * 2)
    val hot = DataFrameOps.detectHotKeys(big, "k", support = 0.4)
    assert(hot.contains(9L), s"90%-share key must be detected, got $hot")
    val dim = df("k BIGINT, name STRING", Seq(9L, "hot"), Seq(1900L, "cold"))
    val plain = big.join(dim, Seq("k"), "inner")
    val salted = DataFrameOps.saltedJoin(
      big, dim.hint("merge"), Seq("k"), saltFactor = 4, hotKeys = Some(hot))
    assert(salted.count() == plain.count())
    assertThrows[IllegalArgumentException](
      DataFrameOps.detectHotKeys(big, "k", support = 1e-5))
    assertThrows[graft.ColumnNotInDataframeError](
      DataFrameOps.detectHotKeys(big, "missing"))
  }

  test("saltedJoin hotKeys salts only the listed keys") {
    val big = spark.range(1000).toDF("k")
      .withColumn("k", when(col("k") < 900, 1L).otherwise(col("k"))) // 90% on k=1
      .withColumn("v", col("k") * 10)
    val dim = df("k BIGINT, name STRING",
      Seq(1L, "hot"), Seq(950L, "cold"), Seq(99L, "unmatched"))
    val plain = big.join(dim, Seq("k"), "left")
    val salted = DataFrameOps.saltedJoin(
      big, dim.hint("merge"), Seq("k"), "left", saltFactor = 8,
      hotKeys = Some(Seq(1L)))
    assert(salted.queryExecution.analyzed.toString.contains("__graft_salt"))
    assert(salted.count() == plain.count())
    assert(salted.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      plain.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    // empty hot set means nothing to salt: plain join, no machinery
    val none = DataFrameOps.saltedJoin(
      big, dim.hint("merge"), Seq("k"), saltFactor = 8, hotKeys = Some(Seq.empty))
    assert(!none.queryExecution.analyzed.toString.contains("__graft_salt"))
    assertThrows[IllegalArgumentException](DataFrameOps.saltedJoin(
      big, dim, Seq("k", "v"), saltFactor = 8, hotKeys = Some(Seq(1L))))
  }

  test("saltedJoin equivalence grid: type x factor x targeting on a skewed corpus") {
    // per-key row counts must match the plain join for every
    // configuration of the machinery — the invariant that makes every
    // salting knob safe to turn
    val big = spark.range(3000).toDF("k")
      .withColumn("k",
        when(col("k") < 2400, col("k") % 2) // two hot keys: 0, 1
          .otherwise(col("k")))
      .withColumn("v", col("k") * 7)
    val dim = df("k BIGINT, name STRING",
      Seq(0L, "h0"), Seq(1L, "h1"), Seq(2500L, "cold"), Seq(9999L, "unmatched"))
    for {
      how <- Seq("inner", "left")
      factor <- Seq(2, 8)
      hot <- Seq(None, Some(Seq(0L, 1L)))
    } {
      val plain = big.join(dim, Seq("k"), how)
        .groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val salted = DataFrameOps.saltedJoin(
          big, dim.hint("merge"), Seq("k"), how, factor, hot)
        .groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(salted == plain, s"mismatch at how=$how factor=$factor hot=$hot")
    }
  }

  test("leadOver / lagOver / ntileOver") {
    val d = df("g STRING, o INT, v DOUBLE",
      Seq("a", 1, 10.0), Seq("a", 2, 20.0), Seq("a", 3, 30.0))
    val out = d.select($"o",
      Windows.lagOver($"v", 1, Seq("g"), Seq("o")).as("prev"),
      Windows.leadOver($"v", 1, Seq("g"), Seq("o")).as("next"),
      Windows.ntileOver(2, Seq("g"), Seq("o")).as("half"))
      .orderBy("o").collect()
    assert(out(0).isNullAt(1) && out(0).getDouble(2) == 20.0 && out(0).getInt(3) == 1)
    assert(out(2).getDouble(1) == 20.0 && out(2).isNullAt(2) && out(2).getInt(3) == 2)
  }
}
