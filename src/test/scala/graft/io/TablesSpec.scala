package graft.io

import org.apache.spark.sql.functions._

import graft.{ColumnNotInDataframeError, DataframeEmptyError, SparkTestBase, TableNotFoundError}

class TablesSpec extends SparkTestBase {
  import spark.implicits._

  test("applyColumnPipeline keep → drop → rename order with strict validation") {
    val d = df("a INT, b INT, c INT", Seq(1, 2, 3))
    val out = Tables.applyColumnPipeline(d,
      keepColumns = Seq("a", "b"), dropColumns = Seq("b"),
      renameColumns = Map("a" -> "aa"))
    assert(out.columns.toSeq == Seq("aa"))
    assertThrows[ColumnNotInDataframeError](
      Tables.applyColumnPipeline(d, keepColumns = Seq("zz")))
    assertThrows[ColumnNotInDataframeError](
      Tables.applyColumnPipeline(d, dropColumns = Seq("zz")))
    assertThrows[ColumnNotInDataframeError](
      Tables.applyColumnPipeline(d, renameColumns = Map("zz" -> "x")))
  }

  test("loadCsv reads with header and column pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    df("a INT, b STRING", Seq(1, "x"), Seq(2, "y"))
      .write.mode("overwrite").option("header", "true").csv(dir)
    val out = Tables.loadCsv(spark, dir,
      keepColumns = Seq("a", "b"), renameColumns = Map("b" -> "bb"),
      options = Map("inferSchema" -> "true"))
    assert(out.columns.toSeq == Seq("a", "bb"))
    assert(out.count() == 2)
  }

  test("loadCsv multiLine strips the trailing CR from the last header") {
    // reference parity: helpers/pyspark.py:889-892
    val dir = java.nio.file.Files.createTempDirectory("graft_crlf").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/crlf.csv"),
      "a,b\r\n1,\"x\ny\"\r\n")
    val out = Tables.loadCsv(spark, s"$dir/crlf.csv",
      options = Map("multiLine" -> "true"))
    assert(out.columns.toSeq == Seq("a", "b"))
    assert(out.count() == 1)
  }

  test("extractDatabaseName handles 1/2/3-part identifiers") {
    assert(Tables.extractDatabaseName(spark, "db.tbl") == ("db", "tbl"))
    assert(Tables.extractDatabaseName(spark, "cat.db.tbl") == ("db", "tbl"))
    assert(Tables.extractDatabaseName(spark, "tbl") ==
      (spark.catalog.currentDatabase, "tbl"))
    assertThrows[IllegalArgumentException](
      Tables.extractDatabaseName(spark, "a.b.c.d"))
  }

  test("loadAndValidateTable: missing table, empty table, filter validation") {
    assertThrows[TableNotFoundError](
      Tables.loadAndValidateTable(spark, "graft_no_such_table"))
    Seq((1, "a")).toDF("id", "v").write.mode("overwrite").saveAsTable("graft_t1")
    val out = Tables.loadAndValidateTable(spark, "graft_t1")
    assert(out.count() == 1)
    assertThrows[DataframeEmptyError](
      Tables.loadAndValidateTable(spark, "graft_t1", filterCond = Some("id = 99")))
  }

  test("insertDfToTable appends, overwrites, and null-fills missing columns") {
    spark.sql("DROP TABLE IF EXISTS graft_t2")
    val base = Seq((1, "a", 1.5)).toDF("id", "v", "x")
    Tables.insertDfToTable(spark, base, "graft_t2", overwrite = true)
    Tables.insertDfToTable(spark, Seq((2, "b", 2.5)).toDF("id", "v", "x"), "graft_t2")
    assert(spark.table("graft_t2").count() == 2)
    // missing column requires fillMissingCols
    assertThrows[ColumnNotInDataframeError](
      Tables.insertDfToTable(spark, Seq((3, "c")).toDF("id", "v"), "graft_t2"))
    Tables.insertDfToTable(spark, Seq((3, "c")).toDF("id", "v"), "graft_t2",
      fillMissingCols = true)
    val r3 = spark.table("graft_t2").filter($"id" === 3).head()
    assert(r3.isNullAt(r3.fieldIndex("x")))
    // extra column always rejected
    assertThrows[ColumnNotInDataframeError](
      Tables.insertDfToTable(spark,
        Seq((4, "d", 1.0, "extra")).toDF("id", "v", "x", "zz"), "graft_t2"))
    // overwrite replaces contents
    Tables.insertDfToTable(spark, base, "graft_t2", overwrite = true)
    assert(spark.table("graft_t2").count() == 1)
  }

  test("writeAndReadTable round-trips filtered on run id") {
    spark.sql("DROP TABLE IF EXISTS graft_t3")
    val d = Seq(("r1", 1), ("r1", 2)).toDF("run_id", "v")
    val back = Tables.writeAndReadTable(spark, d, "graft_t3", "run_id", "r1",
      overwrite = true)
    assert(back.count() == 2)
  }

  test("truncateExternalTable empties unpartitioned table, keeps schema") {
    spark.sql("DROP TABLE IF EXISTS graft_t4")
    Seq((1, "a")).toDF("id", "v").write.saveAsTable("graft_t4")
    Tables.truncateExternalTable(spark, "graft_t4")
    val t = spark.table("graft_t4")
    assert(t.count() == 0)
    assert(t.columns.toSeq == Seq("id", "v"))
    assertThrows[TableNotFoundError](
      Tables.truncateExternalTable(spark, "graft_no_such"))
  }

  test("getCurrentDatabase and getTablesInDatabase") {
    assert(Tables.getCurrentDatabase(spark) == "default")
    Seq((1, "a")).toDF("id", "v").write.mode("overwrite").saveAsTable("graft_t5")
    assert(Tables.getTablesInDatabase(spark).contains("graft_t5"))
  }

  test("tableColumns lists schema-ordered column names (get_table_columns parity)") {
    Seq((1, "a", 2.0)).toDF("id", "v", "w")
      .write.mode("overwrite").saveAsTable("graft_t6")
    assert(Tables.tableColumns(spark, "graft_t6") == Seq("id", "v", "w"))
    assert(Tables.tableColumns(spark, "default.graft_t6") == Seq("id", "v", "w"))
    assertThrows[org.apache.spark.sql.AnalysisException](
      Tables.tableColumns(spark, "no_such_table_anywhere"))
  }
}
