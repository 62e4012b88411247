package graft.core

import graft.SparkTestBase
import graft.core.Frequent._

class FrequentSpec extends SparkTestBase {
  import spark.implicits._

  test("frequentItems finds planted heavy hitters with lower-bound counts") {
    // 2 heavy items (300/200 of 600) against a 100-item tail
    val data = (Seq.fill(300)("hot1") ++ Seq.fill(200)("hot2") ++
      (1 to 100).map(i => s"tail$i")).toDF("item")
    val out = frequentItems(data, "item", k = 8).collect()
      .map(r => r.getAs[String]("item") -> r.getAs[Long]("est_count")).toMap
    assert(out.contains("hot1") && out.contains("hot2"))
    assert(out("hot1") <= 300 && out("hot2") <= 200)
    // n/(k+1) = 600/9 ≈ 66.7 under-count bound
    assert(300 - out("hot1") <= 67 && 200 - out("hot2") <= 67)
    assert(out.size <= 8)
  }

  test("MG contract holds on adversarial distributions (randomized, seeded)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val k = 4 + rnd.nextInt(12)
      // zipf-ish: item i with weight ~ 1/i
      val items = (1 to 2000).map { _ =>
        val r = rnd.nextDouble()
        val i = math.min(50, math.max(1, math.floor(1.0 / (r + 0.02)).toInt))
        s"i$i"
      }
      val df = items.toDF("item")
      val row = checkGuarantee(df, "item", k).collect()(0)
      assert(row.getAs[Boolean]("within_k"), s"trial $trial k=$k: summary > k")
      assert(row.getAs[Long]("n_heavy_missing") == 0L,
        s"trial $trial k=$k: heavy item missing")
      assert(row.getAs[Long]("overcount_violations") == 0L)
      assert(row.getAs[Long]("bound_violations") == 0L)
      assert(row.getAs[Long]("n_heavy") > 0L, "degenerate trial: no heavy items")
    }
  }

  test("merge across partitions preserves the bound") {
    val data = (Seq.fill(500)("hot") ++ (1 to 400).map(i => s"t$i"))
    val df = spark.sparkContext.parallelize(data, 16).toDF("item")
    val row = checkGuarantee(df, "item", k = 5).collect()(0)
    assert(row.getAs[Long]("n_heavy_missing") == 0L)
    assert(row.getAs[Long]("overcount_violations") == 0L)
    assert(row.getAs[Long]("bound_violations") == 0L)
  }

  test("exact when distinct items fit in k") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("item")
    val out = frequentItems(df, "item", k = 10).collect()
      .map(r => (r.getAs[String]("item"), r.getAs[Long]("est_count"),
        r.getAs[Int]("rank")))
    assert(out.toSeq == Seq(("a", 5L, 1), ("b", 3L, 2), ("c", 1L, 3)))
  }

  test("frequentItemsByKey keeps summaries per group; nulls bucketed") {
    val df = Seq(("g1", Some("x")), ("g1", Some("x")), ("g1", None),
      ("g2", Some("y"))).toDF("g", "item")
    val out = frequentItemsByKey(df, Seq("g"), "item", k = 4).collect()
      .map(r => (r.getAs[String]("g"), r.getAs[String]("item"),
        r.getAs[Long]("est_count"))).toSet
    assert(out == Set(("g1", "x", 2L), ("g1", "(null)", 1L), ("g2", "y", 1L)))
  }

  test("summary shuffles counters, not items: partial aggregation in plan") {
    val df = (1 to 1000).map(i => s"i${i % 97}").toDF("item")
    val plan = frequentItems(df, "item", 8)
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate partial pass must run before the exchange
    assert(plan.contains("ObjectHashAggregate"), s"plan:\n$plan")
    val aggLines = plan.linesIterator
      .filter(_.contains("ObjectHashAggregate")).size
    assert(aggLines >= 2, s"expected partial+final aggregate:\n$plan")
  }
}
