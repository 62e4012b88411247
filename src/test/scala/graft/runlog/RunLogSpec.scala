package graft.runlog

import graft.SparkTestBase

class RunLogSpec extends SparkTestBase {

  private val table = "graft_runlog_test"

  private def freshTables(): Unit = {
    // lifecycle through the API: a raw DROP would leave the session's
    // created-table cache stale
    RunLog.dropRunlogTables(spark, table)
    RunLog.createRunlogTable(spark, table)
  }

  test("createRunlogTable creates both tables idempotently") {
    freshTables()
    RunLog.createRunlogTable(spark, table) // second call is a cached no-op
    assert(spark.catalog.tableExists(table))
    assert(spark.catalog.tableExists(s"${table}_reserved_ids"))
    assert(spark.table(table).columns.toSeq ==
      Seq("run_id", "desc", "user", "datetime", "pipeline_name",
        "pipeline_version", "config"))
    // dropRunlogTables invalidates the cache: recreate really recreates
    RunLog.dropRunlogTables(spark, table)
    assert(!spark.catalog.tableExists(table))
    RunLog.createRunlogTable(spark, table)
    assert(spark.catalog.tableExists(table) &&
      spark.catalog.tableExists(s"${table}_reserved_ids"))
  }

  test("reserveId increments across both tables") {
    freshTables()
    assert(RunLog.reserveId(spark, table) == 1)
    assert(RunLog.reserveId(spark, table) == 2)
    RunLog.addEntry(spark, "run", "pipe", "1.0", "{}",
      runId = Some(10), tableName = table)
    assert(RunLog.reserveId(spark, table) == 11)
  }

  test("addEntry appends and recent/last/penultimate read back in order") {
    freshTables()
    val e1 = RunLog.addEntry(spark, "first", "pipe", "1.0", "{}", tableName = table)
    Thread.sleep(5) // distinct datetimes for ordering
    val e2 = RunLog.addEntry(spark, "second", "pipe", "1.0", "{}", tableName = table)
    assert(e2.runId > e1.runId)
    assert(RunLog.lastRunId(spark, table).contains(e2.runId))
    assert(RunLog.penultimateRunId(spark, table).contains(e1.runId))
    assert(RunLog.recentRunIds(spark, 2, table) == Seq(e2.runId, e1.runId))
  }

  test("renderEntry and writeRunlogFile produce the text form") {
    freshTables()
    val e = RunLog.addEntry(spark, "desc here", "pipe", "2.0", "{\"k\":1}",
      tableName = table)
    val text = RunLog.renderEntry(e)
    assert(text.contains(s"run_id: ${e.runId}"))
    assert(text.contains("pipeline_version: 2.0"))
    val path = java.nio.file.Files.createTempDirectory("graft_runlog").toString + "/log.txt"
    RunLog.writeRunlogFile(spark, e, path)
    assert(graft.io.FileOps.readTextFile(spark, path) == text)
  }
}
