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

  test("database-qualified table names create, use and drop the SAME table") {
    // a whole-string backtick would create a literal `db.table` in the
    // default database while DROP targets db.table — silent split-brain
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_rl_db")
    try {
      val qualified = "graft_rl_db.pipeline_runlog"
      RunLog.dropRunlogTables(spark, qualified)
      RunLog.createRunlogTable(spark, qualified)
      assert(spark.catalog.tableExists(qualified),
        "table must land in graft_rl_db, not as a literal name in default")
      assert(!spark.catalog.tableExists("`graft_rl_db.pipeline_runlog`"))
      val e = RunLog.addEntry(spark, "qualified", "pipe", "1.0", "{}",
        tableName = qualified)
      assert(RunLog.lastRunId(spark, qualified).contains(e.runId))
      // drop removes the catalog entries AND the db-scoped storage dir
      RunLog.dropRunlogTables(spark, qualified)
      assert(!spark.catalog.tableExists(qualified))
      assert(!spark.catalog.tableExists(s"${qualified}_reserved_ids"))
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"))
      val loc = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(wh, "graft_rl_db.db"), "pipeline_runlog")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(loc), s"db-scoped storage $loc must be cleaned up")
      // recreate after drop works (cache was evicted)
      RunLog.createRunlogTable(spark, qualified)
      assert(spark.catalog.tableExists(qualified))
      RunLog.dropRunlogTables(spark, qualified)
    } finally spark.sql("DROP DATABASE IF EXISTS graft_rl_db CASCADE")
  }

  test("a backtick-quoted dotted name resolves as ONE object on every face") {
    // Spark's SessionCatalog forbids '.' in actual table names, so a
    // literal `a.b` can never be created — the regression here is the
    // SHAPE of the failure. Pre-fix, the DDL path re-split the raw
    // string on '.', so create targeted database-a/table-b — a
    // DIFFERENT object than the one the cache key and cleanup resolve
    // — and could silently succeed against it. One parse now drives
    // every face: create fails loudly on the single resolved name,
    // nothing is half-created, drop is a same-object no-op.
    val dotted = "`graft_rl.dotted`"
    intercept[org.apache.spark.sql.AnalysisException](
      RunLog.createRunlogTable(spark, dotted))
    // no split-brain artifacts: neither a graft_rl database nor any
    // default-db table materialized from the failed create
    assert(!spark.catalog.databaseExists("graft_rl"))
    assert(spark.catalog.listTables("default").collect()
      .forall(t => !t.name.contains("dotted")))
    // the drop path resolves the SAME single object — a clean no-op,
    // not DDL aimed at a differently-parsed name
    RunLog.dropRunlogTables(spark, dotted)
    // and the failed create must not have poisoned the cache: a valid
    // name still creates normally afterwards
    val ok = "graft_rl_dotted_sibling"
    RunLog.dropRunlogTables(spark, ok)
    RunLog.createRunlogTable(spark, ok)
    assert(spark.catalog.tableExists(ok))
    RunLog.dropRunlogTables(spark, ok)
  }

  test("drop through a cloned session evicts the shared created-table cache") {
    // cloned sessions share one catalog: session-keyed caching would
    // leave the sibling's entry live after a drop, making its next
    // createRunlogTable a no-op and the addEntry after it fail
    val t = "graft_runlog_clone_test"
    RunLog.dropRunlogTables(spark, t)
    RunLog.createRunlogTable(spark, t)
    val clone = spark.newSession()
    RunLog.dropRunlogTables(clone, t)
    assert(!spark.catalog.tableExists(t))
    RunLog.createRunlogTable(spark, t) // must really recreate
    val e = RunLog.addEntry(spark, "after clone drop", "pipe", "1.0", "{}",
      tableName = t)
    assert(RunLog.lastRunId(spark, t).contains(e.runId))
    RunLog.dropRunlogTables(spark, t)
  }

  test("unqualified names resolve against the session's current database") {
    // the created-table cache is context-wide: raw-string keys would
    // let a create in db_a satisfy a create of the SAME raw name in
    // default, leaving the second session's table missing
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_rl_cur")
    try {
      val clone = spark.newSession()
      clone.catalog.setCurrentDatabase("graft_rl_cur")
      RunLog.dropRunlogTables(clone, "pipeline_runlog")
      RunLog.createRunlogTable(clone, "pipeline_runlog")
      assert(clone.catalog.tableExists("graft_rl_cur.pipeline_runlog"))
      RunLog.dropRunlogTables(spark, "pipeline_runlog")
      RunLog.createRunlogTable(spark, "pipeline_runlog")
      assert(spark.catalog.tableExists("default.pipeline_runlog"),
        "create in default must not be short-circuited by db_a's cache entry")
      val e = RunLog.addEntry(spark, "in default", "pipe", "1.0", "{}")
      assert(RunLog.lastRunId(spark).contains(e.runId))
      RunLog.dropRunlogTables(spark, "pipeline_runlog")
      RunLog.dropRunlogTables(clone, "pipeline_runlog")
    } finally spark.sql("DROP DATABASE IF EXISTS graft_rl_cur CASCADE")
  }

  test("dropRunlogTables preserves EXTERNAL table data, matching DROP TABLE") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rl_ext")
    val marker = dir.resolve("keep.txt")
    java.nio.file.Files.writeString(marker, "external data")
    spark.sql(s"CREATE TABLE graft_rl_ext_t (${RunLog.runlogSchema.toDDL}) " +
      s"USING parquet LOCATION '$dir'")
    try {
      RunLog.dropRunlogTables(spark, "graft_rl_ext_t")
      assert(!spark.catalog.tableExists("graft_rl_ext_t"))
      assert(java.nio.file.Files.exists(marker),
        "external location must survive the drop, like DROP TABLE itself")
    } finally spark.sql("DROP TABLE IF EXISTS graft_rl_ext_t")
  }

  test("differently-cased names alias one table AND one cache entry") {
    // the catalog resolves unquoted identifiers case-insensitively: a
    // case-preserving cache key would survive a lowercase drop and turn
    // the next mixed-case create into a stale no-op
    RunLog.dropRunlogTables(spark, "graft_case_t")
    RunLog.createRunlogTable(spark, "Graft_Case_T")
    assert(spark.catalog.tableExists("graft_case_t"))
    RunLog.dropRunlogTables(spark, "graft_case_t")
    assert(!spark.catalog.tableExists("graft_case_t"))
    RunLog.createRunlogTable(spark, "Graft_Case_T") // must really recreate
    val e = RunLog.addEntry(spark, "cased", "pipe", "1.0", "{}",
      tableName = "graft_case_t")
    assert(RunLog.lastRunId(spark, "graft_case_t").contains(e.runId))
    RunLog.dropRunlogTables(spark, "Graft_Case_T")
  }

  test("stale cleanup for a vanished database follows the db.db layout, not the warehouse root") {
    // fresh-metastore-over-old-warehouse case: the db is gone from the
    // catalog; cleanup must target <wh>/<db>.db/<table> and must NOT
    // delete <wh>/<table>, which is the DEFAULT database's location
    // for an unrelated same-named table
    import org.apache.hadoop.fs.Path
    val wh = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stale = new Path(new Path(wh, "graft_ghost_db.db"), "graft_ghost_t")
    val unrelated = new Path(wh, "graft_ghost_t")
    fs.mkdirs(stale)
    fs.mkdirs(unrelated)
    try {
      RunLog.dropRunlogTables(spark, "graft_ghost_db.graft_ghost_t")
      assert(!fs.exists(stale), "stale db-scoped dir must be cleaned")
      assert(fs.exists(unrelated),
        "default-db location of an unrelated table must survive")
    } finally {
      fs.delete(new Path(wh, "graft_ghost_db.db"), true)
      fs.delete(unrelated, true)
    }
  }

  test("stale cleanup for a vanished database is reached by mixed-case names") {
    // same fresh-metastore case, but the caller types the name in mixed
    // case: the catalog lowercases managed db/table dirs on disk
    // (case-insensitive resolution), so the fallback path must be
    // computed from the catalog-formatted name, not the as-typed one
    import org.apache.hadoop.fs.Path
    val wh = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stale = new Path(new Path(wh, "graft_ghost2_db.db"), "graft_ghost2_t")
    fs.mkdirs(stale)
    try {
      RunLog.dropRunlogTables(spark, "Graft_Ghost2_DB.Graft_Ghost2_T")
      assert(!fs.exists(stale),
        "mixed-case name must clean the lowercased on-disk dir")
    } finally {
      fs.delete(new Path(wh, "graft_ghost2_db.db"), true)
    }
  }

  test("spark.sql.caseSensitive=true keeps differently-cased tables distinct") {
    // under case-SENSITIVE resolution `Graft_CS_T` and `graft_cs_t`
    // are different tables: lowercasing the cache key would alias
    // them, turning the second create into a stale no-op and failing
    // the following addEntry on a table that was never created
    spark.conf.set("spark.sql.caseSensitive", "true")
    try {
      RunLog.dropRunlogTables(spark, "Graft_CS_T")
      RunLog.dropRunlogTables(spark, "graft_cs_t")
      RunLog.createRunlogTable(spark, "Graft_CS_T")
      RunLog.createRunlogTable(spark, "graft_cs_t") // must NOT be cached
      val e = RunLog.addEntry(spark, "cs", "pipe", "1.0", "{}",
        tableName = "graft_cs_t")
      assert(RunLog.lastRunId(spark, "graft_cs_t").contains(e.runId))
    } finally {
      RunLog.dropRunlogTables(spark, "Graft_CS_T")
      RunLog.dropRunlogTables(spark, "graft_cs_t")
      spark.conf.set("spark.sql.caseSensitive", "false")
    }
  }

  test("name resolution is locale-stable (Turkish dotless-i)") {
    // the catalog formats identifiers with Locale.ROOT; a default-locale
    // toLowerCase would turn PIPELINE into pıpelıne under
    // tr-TR, so the cache key and the vanished-table cleanup path would
    // diverge from the catalog's view of the same identifier
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(java.util.Locale.forLanguageTag("tr-TR"))
    try {
      RunLog.dropRunlogTables(spark, "graft_tri_table")
      RunLog.createRunlogTable(spark, "GRAFT_TRI_TABLE")
      val e = RunLog.addEntry(spark, "tr", "pipe", "1.0", "{}",
        tableName = "GRAFT_TRI_TABLE")
      assert(RunLog.lastRunId(spark, "graft_tri_table").contains(e.runId))
      RunLog.dropRunlogTables(spark, "GRAFT_TRI_TABLE")
      assert(!spark.catalog.tableExists("graft_tri_table"))
    } finally java.util.Locale.setDefault(prev)
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
