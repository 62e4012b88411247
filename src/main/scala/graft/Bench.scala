package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object Bench {

  /** Hand-written raw-Spark equivalents of representative wrapped
    * queries — the operative baseline per BASELINE.md ("the equivalent
    * native-Spark DataFrame plan on the same data"). Each ratio
    * wrapped/raw should sit near 1.0: the wrappers are logical-plan
    * sugar, not an execution layer. */
  private def baselines: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_melt" -> ((s, d) => {
      val li = s.read.parquet(s"$d/lineitem.parquet")
        .select(col("l_orderkey").cast("long").as("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"), col("l_discount"), col("l_tax"))
      li.unpivot(Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "variable", "value")
    }),
    "q_first_obs" -> ((s, d) =>
      s.read.parquet(s"$d/orders.parquet")
        .withColumn("rn", row_number().over(
          Window.partitionBy("o_custkey").orderBy("o_orderkey")))
        .filter(col("rn") === 1)
        .select(col("o_custkey").cast("long"), col("o_orderkey").cast("long"),
          col("o_totalprice"))),
    "q_window_running" -> ((s, d) =>
      s.read.parquet(s"$d/orders.parquet")
        .select(col("o_orderkey").cast("long"),
          round(sum("o_totalprice").over(
            Window.partitionBy("o_custkey").orderBy("o_orderdate")), 6)
            .as("run_total"))),
    "q_weighted_arith" -> ((s, d) => {
      val li = s.read.parquet(s"$d/lineitem.parquet")
        .withColumn("share", col("l_quantity") /
          sum("l_quantity").over(Window.partitionBy("l_returnflag")))
      li.groupBy("l_returnflag")
        .agg(round(sum(col("l_extendedprice") * col("share")), 6).as("wavg"))
    }),
    "q_exact_dedup" -> ((s, d) =>
      s.read.parquet(s"$d/documents.parquet")
        .withColumn("fp", md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))))
        .withColumn("rn", row_number().over(
          Window.partitionBy("fp").orderBy("doc_id")))
        .filter(col("rn") === 1)
        .select(col("doc_id").cast("long"))),
    "q_tumbling" -> ((s, d) => {
      val raw = s.read.parquet(s"$d/events.parquet")
      val ev =
        if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        else raw
      ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("sum_value"))
        .select(col("window.start").cast("long").as("window_start"),
          col("window.end").cast("long").as("window_end"),
          col("event_type"), col("n_events"), col("sum_value"))
    }),
    "q_rank_numeric" -> ((s, d) =>
      s.read.parquet(s"$d/lineitem.parquet")
        .withColumn("rnk", row_number().over(
          Window.partitionBy("l_orderkey").orderBy(col("l_linenumber"))))
        .select(col("l_orderkey").cast("long").as("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("rnk").cast("long").as("rnk"))),
    "q_median_price" -> ((s, d) =>
      s.read.parquet(s"$d/lineitem.parquet")
        .withColumn("median_qty", percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
          .over(Window.partitionBy("l_returnflag")))
        .select(col("l_returnflag"), col("median_qty"))
        .distinct()),
    "q_pushdown_read" -> ((s, d) =>
      s.read.parquet(s"$d/lineitem.parquet")
        .select("l_orderkey", "l_shipdate", "l_returnflag", "l_quantity")
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") <= lit("1996-01-01") &&
          col("l_returnflag").isin("A", "N"))
        .select(col("l_orderkey").cast("long").as("l_orderkey"),
          col("l_shipdate").cast("date").as("ship_date"),
          col("l_returnflag"), col("l_quantity"))),
    "q_det_sample" -> ((s, d) =>
      s.read.parquet(s"$d/orders.parquet")
        .select(col("o_orderkey").cast("long").as("o_orderkey"), col("o_totalprice"))
        .filter(substring(md5(concat(lit("s1"), col("o_orderkey").cast("string"))), 1, 8)
          < lit("19999999"))),
    "q_quantize" -> ((s, d) => {
      val dv = s.read.parquet(s"$d/embeddings.parquet")
        .select(col("vec_id").cast("long").as("vec_id"),
          col("embedding").cast("array<double>").as("e"))
        .withColumn("scale",
          coalesce(array_max(transform(col("e"), x => abs(x))), lit(0.0)) / 127.0)
      dv.withColumn("qvec",
          when(col("scale") === 0.0, transform(col("e"), _ => lit(0)))
            .otherwise(transform(col("e"), x => round(x / col("scale"), 0).cast("int"))))
        .select(col("vec_id"), round(col("scale"), 6).as("scale"),
          concat_ws(",", col("qvec")).as("qvec_csv"))
    }),
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/root/repo/target/bench_warehouse")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(fn: => Long): Double = {
      // isolate queries: drop cached relations and nudge the context
      // cleaner so earlier queries' shuffle files don't inflate later
      // measurements through memory pressure
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      fn
      (System.nanoTime() - t0) / 1e9
    }

    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run (debug/profiling aid)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // untimed warm-up: exercise scan → shuffle → window → write codegen
    // paths once so the FIRST measured query doesn't absorb several
    // seconds of JIT/janino cold start the others never pay
    {
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      r.groupBy("r_name").count().count()
      spark.range(100000).select(sum(col("id")).over(
        Window.partitionBy(col("id") % 7).orderBy("id")).as("s"))
        .agg(sum("s")).collect()
      ()
    }
    val results = selected.map { case (name, fn) =>
      var rows = -1L
      val secs = time {
        try { rows = fn(spark, sfDir).count(); rows }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); -1L }
      }
      System.err.println(f"[bench] $name%-22s $secs%8.2fs  rows=$rows")
      name -> secs
    }

    // wrapped-vs-handwritten ratios (see `baselines` doc). The wrapped
    // query is RE-timed back-to-back with its baseline so both sides see
    // the same JIT/codegen warm-up — the suite-order timing above would
    // bias the ratio against whichever ran colder.
    val resultMap = results.toMap
    val ratios = baselines.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (!resultMap.contains(name)) None
      else {
        // best of two: sub-second runs jitter with GC/scheduler noise
        def bestOf2(body: => Long): Double =
          math.min(time(body), time(body))
        val wrappedSecs = bestOf2(
          try SparkEntry.queries(name)(spark, sfDir).count()
          catch { case _: Throwable => -1L })
        val rawSecs = bestOf2(try fn(spark, sfDir).count() catch { case _: Throwable => -1L })
        val ratio = wrappedSecs / math.max(rawSecs, 1e-9)
        System.err.println(
          f"[bench] baseline $name%-20s wrapped=$wrappedSecs%6.2fs raw=$rawSecs%6.2fs ratio=$ratio%5.2f")
        Some(name -> math.rint(ratio * 100) / 100)
      }
    }
    // The harness keeps only the tail of this process's output, so the
    // result line must stay SHORT (< ~1800 bytes) or its opening brace
    // is truncated away and the JSON never parses. Emit 2-decimal
    // seconds and, if the full per-query map still doesn't fit, roll the
    // fastest queries into one "omitted_fastest" aggregate — the slow
    // queries (the ones a reader acts on) always stay itemised.
    def fmt(v: Double): String = {
      val s = java.math.BigDecimal.valueOf(v)
        .setScale(2, java.math.RoundingMode.HALF_UP)
        .stripTrailingZeros.toPlainString
      if (s.isEmpty || s == "-0") "0" else s
    }
    val total = results.map(_._2).sum
    val ratioJson = ratios.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sfName = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    def render(keep: Int): String = {
      val bySlow = results.sortBy(-_._2)
      val (kept, dropped) = bySlow.splitAt(keep)
      val qs = kept.sortBy(_._1)
        .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val omitted =
        if (dropped.isEmpty) ""
        else s""","omitted_fastest":{"n":${dropped.size},"sec":${fmt(dropped.map(_._2).sum)}}"""
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"queries":$qs$omitted,"baseline_ratios":$ratioJson,"sf":"$sfName"}"""
    }
    val line = Iterator.range(results.size, 0, -5).map(render)
      .find(_.length <= 1750)
      .getOrElse(render(0))
    println(line)
    spark.stop()
  }
}
