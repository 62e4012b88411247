package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{ColumnNotInDataframeError, SparkTestBase}

class ReadWriteTableSpec extends SparkTestBase {
  import spark.implicits._

  private def sales = df(
    "id BIGINT, region STRING, amount DOUBLE, sold_at TIMESTAMP, run_id STRING",
    Seq(1L, "east", 10.0, java.sql.Timestamp.valueOf("2024-01-05 10:00:00"), "r1"),
    Seq(2L, "west", 20.0, java.sql.Timestamp.valueOf("2024-01-20 11:00:00"), "r1"),
    Seq(3L, "east", 30.0, java.sql.Timestamp.valueOf("2024-02-10 12:00:00"), "r2"),
    Seq(4L, "north", 40.0, java.sql.Timestamp.valueOf("2024-03-15 13:00:00"), "r2"))

  test("buildFilterCondition composes date range, value filters AND/OR") {
    val cond = ReadTable.buildFilterCondition(
      dateColumn = Some("sold_at"),
      dateRange = Some(("2024-01-01", "2024-02-01")),
      columnFilters = Map("region" -> Seq("east", "west"))).get
    val out = sales.filter(cond)
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("buildFilterCondition: no filters → None") {
    assert(ReadTable.buildFilterCondition().isEmpty)
  }

  test("readTable selects columns, filters run_id, validates columns") {
    val out = ReadTable.readTable(sales,
      columns = Seq("id", "amount"), runId = Some("r2"))
    assert(out.columns.toSeq == Seq("id", "amount"))
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    assertThrows[ColumnNotInDataframeError](
      ReadTable.readTable(sales, columns = Seq("nope")))
  }

  test("readTable partition trunc-equality filter") {
    val out = ReadTable.readTable(sales,
      partitionColumn = Some("sold_at"),
      partitionType = Some("month"),
      partitionValue = Some(Left("2024-01-15")))
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assertThrows[IllegalArgumentException](
      ReadTable.readTable(sales, partitionColumn = Some("sold_at"),
        partitionType = Some("fortnight"), partitionValue = Some(Left("2024-01-15"))))
  }

  test("readTable filters are pushed down to the parquet scan") {
    val dir = Files.createTempDirectory("graft_pushdown").toString
    sales.write.mode("overwrite").parquet(dir)
    val out = ReadTable.readParquet(spark, dir,
      columns = Seq("id", "region"),
      columnFilters = Map("region" -> Seq("east")))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("region"),
      s"expected pushed filter in plan:\n$plan")
    // column pruning: scan schema should not include amount
    assert(plan.contains("ReadSchema") && !plan.contains("amount"),
      s"expected pruned schema in plan:\n$plan")
    assert(out.count() == 2)
  }

  test("readTable flattens struct columns when asked") {
    val nested = sales.select($"id", struct($"region", $"amount").as("info"))
    val out = ReadTable.readTable(nested, flattenStructCols = true)
    assert(out.columns.toSeq == Seq("id", "region", "amount"))
  }

  test("writeTable partitions by truncated time key and prunes on read") {
    val dir = Files.createTempDirectory("graft_writetable").toString + "/t"
    WriteTable.writeTable(sales, dir, mode = "overwrite",
      partitionCol = Some("sold_at"), partitionType = Some("month"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 4)
    val pruned = back.filter($"part_key" === "2024-01-01T00:00:00")
    assert(pruned.count() == 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"expected partition pruning:\n$plan")
  }

  test("writeTable rejects an input column named part_key when partitioning") {
    assertThrows[IllegalArgumentException](
      WriteTable.writeTable(sales.withColumnRenamed("region", "part_key"),
        "/dev/null", partitionCol = Some("sold_at")))
    // unpartitioned writes have no derived key — the name is fine there
    val dir = Files.createTempDirectory("graft_partkey").toString + "/t"
    WriteTable.writeTable(sales.withColumnRenamed("region", "part_key"),
      dir, mode = "overwrite")
    assert(spark.read.parquet(dir).count() == 4)
  }

  test("writeTable rejects >4 clustered fields; clusters rows within files") {
    assertThrows[IllegalArgumentException](
      WriteTable.writeTable(sales, "/dev/null", clusteredFields = Seq("a", "b", "c", "d", "e")))
    val dir = Files.createTempDirectory("graft_cluster").toString + "/t"
    WriteTable.writeTable(sales, dir, mode = "overwrite",
      clusteredFields = Seq("region"))
    assert(spark.read.parquet(dir).count() == 4)
  }

  test("writeTable spreads a hot partition value over several tasks, bounded files") {
    // one ~MB January vs a 2-row February: under REBALANCE + AQE the hot
    // month must be SPLIT across >1 writer task (each task → one file in
    // the same directory) while the cold month stays at ~1 file. The old
    // repartition(part_key) shape pinned each month to exactly one task.
    val dir = Files.createTempDirectory("graft_skewwrite").toString + "/t"
    val hot = spark.range(20000).select(
      $"id",
      concat(lit("row-"), $"id").as("payload"),
      lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")).as("sold_at"))
    val cold = spark.range(2).select(
      ($"id" + 100000L).as("id"),
      lit("cold").as("payload"),
      lit(java.sql.Timestamp.valueOf("2024-02-10 00:00:00")).as("sold_at"))
    val advisory = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try {
      WriteTable.writeTable(hot.union(cold), dir, mode = "overwrite",
        partitionCol = Some("sold_at"), partitionType = Some("month"),
        clusteredFields = Seq("id"))
    } finally {
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
    }
    def files(month: String): Int = {
      val sub = new java.io.File(dir).listFiles()
        .find(f => f.getName.startsWith("part_key=") && f.getName.contains(month))
        .getOrElse(fail(s"no partition dir for $month under $dir"))
      sub.listFiles().count(_.getName.startsWith("part-"))
    }
    val hotFiles = files("2024-01")
    val coldFiles = files("2024-02")
    assert(hotFiles > 1, s"hot month should be served by >1 task, got $hotFiles file(s)")
    assert(hotFiles <= 64, s"hot month file count should stay bounded, got $hotFiles")
    assert(coldFiles <= 2, s"cold month should stay at ~1 file, got $coldFiles")
    assert(spark.read.parquet(dir).count() == 20002)
  }

  test("expireOldPartitions deletes partitions older than the window") {
    val dir = Files.createTempDirectory("graft_expire").toString + "/t"
    WriteTable.writeTable(sales, dir, mode = "overwrite",
      partitionCol = Some("sold_at"), partitionType = Some("month"))
    // partition keys are period STARTS; a mid-January cutoff expires
    // only the January partition (2024-01-01 < cutoff < 2024-02-01)
    val cutover = java.time.LocalDateTime.of(2024, 1, 15, 0, 0)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    val expired = WriteTable.expireOldPartitions(spark, dir,
      expiryDays = 0, nowMillis = cutover)
    assert(expired.size == 1)
    assert(spark.read.parquet(dir).count() == 2) // feb + march survive
  }

  test("writeCatalogTable writes partitioned catalog table") {
    spark.sql("DROP TABLE IF EXISTS graft_wt1")
    WriteTable.writeCatalogTable(sales, "graft_wt1", mode = "overwrite",
      partitionBy = Seq("region"))
    assert(spark.table("graft_wt1").count() == 4)
  }

  test("bucketed tables join without an exchange on the bucket key") {
    spark.sql("DROP TABLE IF EXISTS graft_bt1")
    spark.sql("DROP TABLE IF EXISTS graft_bt2")
    WriteTable.writeBucketedTable(
      sales.select($"id", $"amount"), "graft_bt1", Seq("id"), 4, Seq("id"),
      mode = "overwrite")
    WriteTable.writeBucketedTable(
      sales.select($"id".as("id"), $"region"), "graft_bt2", Seq("id"), 4, Seq("id"),
      mode = "overwrite")
    val joined = spark.table("graft_bt1").join(spark.table("graft_bt2"), "id")
    assert(joined.count() == 4)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assertThrows[IllegalArgumentException](
      WriteTable.writeBucketedTable(sales, "x", Nil, 4))
  }

  test("refreshTableMetadata refreshes; missing table raises") {
    spark.sql("DROP TABLE IF EXISTS graft_rt1")
    Seq((1, "a")).toDF("id", "v").write.saveAsTable("graft_rt1")
    Tables.refreshTableMetadata(spark, "graft_rt1") // no throw
    assertThrows[graft.TableNotFoundError](
      Tables.refreshTableMetadata(spark, "graft_no_table"))
  }
}
