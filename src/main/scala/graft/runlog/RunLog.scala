package graft.runlog

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pipeline run-log subsystem (reference:
  * rdsa_utils/cdp/io/pipeline_runlog.py:40-405): two parquet catalog
  * tables — the run log itself and a reserved-ids table — plus id
  * reservation, entry creation and retrieval helpers.
  */
object RunLog {

  val runlogSchema: StructType = StructType(Seq(
    StructField("run_id", IntegerType),
    StructField("desc", StringType),
    StructField("user", StringType),
    StructField("datetime", TimestampType),
    StructField("pipeline_name", StringType),
    StructField("pipeline_version", StringType),
    StructField("config", StringType),
  ))

  val reservedIdsSchema: StructType = StructType(Seq(
    StructField("run_id", IntegerType),
    StructField("reserved_date", TimestampType),
  ))

  /** One-row (or empty) DataFrame as a LocalRelation — NOT
    * sparkContext.parallelize, which would plan defaultParallelism
    * tasks (32 here) to write a single row. A LocalRelation write is
    * one task; at 1.73 s the benched subsystem spent most of its time
    * in four 32-task one-row jobs (r8). */
  private def localDf(spark: SparkSession, schema: StructType, rows: Row*): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.toList.asJava, schema)
  }

  /** Fully-quoted, database-qualified DDL/DML names for the (runlog,
    * reserved-ids) table pair, derived from the SAME parse as
    * [[cacheKey]] and [[cleanupLocation]] (resolvedName →
    * parseTableIdentifier). One parse for every face: a raw-string
    * split on '.' here would send the DDL for a backtick-quoted name
    * like `` `a.b` `` to database `a` table `b` while the cache key and
    * cleanup resolve ONE table named "a.b" — create and drop/cleanup
    * would silently operate on different objects. Backticking each
    * RESOLVED part (with `` ` `` doubled) keeps dotted and backtick-
    * carrying table names one literal identifier everywhere; the
    * reserved-ids suffix is appended to the parsed TABLE part, not the
    * raw string, so `` `a.b` `` pairs with `` `a.b_reserved_ids` ``
    * instead of the unparseable `` `a.b`_reserved_ids ``. Qualifying
    * with the resolved database also pins the pair to ONE database
    * even if the session's current database changes between calls. */
  private def quotedNames(spark: SparkSession, tableName: String): (String, String) = {
    val (db, table) = resolvedName(spark, tableName)
    def q(s: String) = "`" + s.replace("`", "``") + "`"
    (s"${q(db)}.${q(table)}", s"${q(db)}.${q(table + "_reserved_ids")}")
  }

  /** Tables this JVM already created-or-verified: createRunlogTable is
    * called create-if-absent from pipelines, and repeating the catalog
    * existence probes on every call is pure bookkeeping tax (a real
    * metastore round-trips per probe). Keyed WEAKLY by the
    * SparkContext — shared by every session (and `newSession()` clone)
    * of one JVM-local catalog/warehouse — so (a) no strong SparkSession
    * reference is pinned (many short-lived sessions in one JVM stay
    * collectable; keying by session would also give cloned sessions of
    * ONE catalog separate entries, letting a drop through session A
    * leave session B's entry live and B's next create a no-op) and
    * (b) a drop through any session evicts the entry every sibling
    * sees. Dropping a runlog table outside this API is the one case
    * the cache misses, matching the reference's assumption that the
    * log tables are managed only through it. */
  private val verifiedTables =
    new java.util.WeakHashMap[org.apache.spark.SparkContext, java.util.Set[String]]()

  private def verifiedSet(spark: SparkSession): java.util.Set[String] =
    verifiedTables.synchronized {
      verifiedTables.computeIfAbsent(spark.sparkContext,
        _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
    }

  /** Catalog-resolved (database, table) for a possibly-unqualified
    * name. Cache keys and warehouse layouts must use the RESOLVED
    * database: the context-wide cache is shared by sessions whose
    * current databases differ, so caching the raw string
    * "pipeline_runlog" would let session A's create (in db_a) satisfy
    * session B's create (in db_b) and B's addEntry would then fail on
    * a missing table. Names are case-formatted exactly as the catalog
    * formats them (SessionCatalog.formatTableName): lowercased under
    * the default case-INsensitive resolution — "Pipeline_Runlog" and
    * "pipeline_runlog" alias one table, one cache entry, one on-disk
    * `<db>.db/<table>` directory — but preserved verbatim under
    * spark.sql.caseSensitive=true, where `Runlog` and `runlog` really
    * are distinct tables and lowercasing would alias their cache
    * entries (a second create would no-op and the following addEntry
    * would fail on the missing table). */
  private def resolvedName(spark: SparkSession, name: String): (String, String) = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
    val db = ident.database.getOrElse(spark.sessionState.catalog.getCurrentDatabase)
    if (spark.sessionState.conf.caseSensitiveAnalysis) (db, ident.table)
    else (db.toLowerCase(java.util.Locale.ROOT),
      ident.table.toLowerCase(java.util.Locale.ROOT))
  }

  private def cacheKey(spark: SparkSession, name: String): String = {
    val (db, table) = resolvedName(spark, name)
    s"$db.$table"
  }

  /** Create both tables if missing (parquet-backed catalog tables; the
    * reference's DDL at pipeline_runlog.py:73-95). Pure DDL — an empty
    * saveAsTable would run a write job just to produce an empty parquet
    * file; CREATE TABLE IF NOT EXISTS touches only the catalog. */
  def createRunlogTable(spark: SparkSession, tableName: String = "pipeline_runlog"): Unit = {
    val cache = verifiedSet(spark)
    val key = cacheKey(spark, tableName)
    if (cache.contains(key)) return
    val (runlog, reserved) = quotedNames(spark, tableName)
    spark.sql(s"CREATE TABLE IF NOT EXISTS $runlog " +
      s"(${runlogSchema.toDDL}) USING parquet")
    spark.sql(s"CREATE TABLE IF NOT EXISTS $reserved " +
      s"(${reservedIdsSchema.toDDL}) USING parquet")
    cache.add(key)
  }

  /** Storage location to CLEAN UP after dropping `name`, resolved from
    * the catalog via direct SessionCatalog metadata lookup (not
    * `DESCRIBE TABLE EXTENDED` — a DESCRIBE is a parsed + planned SQL
    * command per table and measurably taxes the benched runlog
    * lifecycle). `None` for EXTERNAL tables: DROP TABLE preserves
    * external data by Spark contract, and so must we. When the table
    * is already gone from the catalog (the stale-leftover case this
    * cleanup exists for), fall back to the managed layout under the
    * RESOLVED database's location — `<db location>/<table>`, never the
    * default database's directory for a session whose current database
    * is elsewhere. */
  private def cleanupLocation(
      spark: SparkSession, name: String): Option[org.apache.hadoop.fs.Path] = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.catalyst.catalog.CatalogTableType
    val catalog = spark.sessionState.catalog
    val (db, table) = resolvedName(spark, name)
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table, Some(db))
    if (catalog.tableExists(ident)) {
      val meta = catalog.getTableMetadata(ident)
      if (meta.tableType == CatalogTableType.EXTERNAL) None
      else Some(new Path(meta.location))
    } else {
      // db gone from the catalog too (fresh metastore over an old
      // warehouse): the stale dir follows the standard non-default
      // layout `<warehouse>/<db>.db/` — NEVER the bare warehouse dir,
      // which is the DEFAULT database's location and would delete an
      // unrelated same-named table's live data
      val dbLoc =
        if (catalog.databaseExists(db))
          new Path(catalog.getDatabaseMetadata(db).locationUri)
        else new Path(
          new Path(spark.conf.get("spark.sql.warehouse.dir")), s"$db.db")
      Some(new Path(dbLoc, table))
    }
  }

  /** Drop both runlog tables (and any stale storage location a
    * previous JVM left behind) and invalidate the created-table cache
    * for every session sharing this catalog. External-table data is
    * preserved, matching DROP TABLE. Runlog table lifecycle must go
    * through this API — an external DROP would leave the cache
    * believing the tables exist. */
  def dropRunlogTables(spark: SparkSession, tableName: String = "pipeline_runlog"): Unit = {
    val (runlog, reserved) = quotedNames(spark, tableName)
    Seq(runlog, reserved).foreach { t =>
      // resolve the location BEFORE the drop (the catalog forgets it
      // after); the quoted name round-trips through the same parser
      val loc = cleanupLocation(spark, t)
      spark.sql(s"DROP TABLE IF EXISTS $t")
      loc.foreach { l =>
        val fs = l.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(l)) fs.delete(l, true)
      }
    }
    verifiedSet(spark).remove(cacheKey(spark, tableName))
  }

  /** Reserve the next run id: max(run_id)+1 over both tables, else 1
    * (reference: pipeline_runlog.py:98-134). Both maxima fold into ONE
    * Spark job (union of the two run_id columns) instead of a
    * collect per table. */
  def reserveId(spark: SparkSession, tableName: String = "pipeline_runlog"): Int = {
    val (runlog, reserved) = quotedNames(spark, tableName)
    val present = Seq(runlog, reserved).filter(spark.catalog.tableExists)
    val maxSeen =
      if (present.isEmpty) 0
      else {
        val r = present.map(t => spark.read.table(t).select(col("run_id")))
          .reduce(_ unionAll _).agg(max("run_id")).collect()(0)
        if (r.isNullAt(0)) 0 else r.getInt(0)
      }
    val next = maxSeen + 1
    val now = new Timestamp(System.currentTimeMillis())
    localDf(spark, reservedIdsSchema, Row(next, now))
      .write.mode("append").insertInto(reserved)
    next
  }

  case class RunlogEntry(
      runId: Int,
      desc: String,
      user: String,
      datetime: Timestamp,
      pipelineName: String,
      pipelineVersion: String,
      config: String)

  /** Append an entry (reference: pipeline_runlog.py:236-295). User
    * resolution mirrors the reference's HADOOP_USER_NAME fallback. */
  def addEntry(
      spark: SparkSession,
      desc: String,
      pipelineName: String,
      pipelineVersion: String,
      config: String,
      runId: Option[Int] = None,
      tableName: String = "pipeline_runlog"): RunlogEntry = {
    val id = runId.getOrElse(reserveId(spark, tableName))
    val user = sys.env.getOrElse("HADOOP_USER_NAME",
      System.getProperty("user.name", "unknown"))
    val entry = RunlogEntry(id, desc, user,
      new Timestamp(System.currentTimeMillis()), pipelineName, pipelineVersion, config)
    localDf(spark, runlogSchema, Row(
        entry.runId, entry.desc, entry.user, entry.datetime,
        entry.pipelineName, entry.pipelineVersion, entry.config))
      .write.mode("append").insertInto(quotedNames(spark, tableName)._1)
    entry
  }

  /** Most recent `limit` run ids, newest first — plans as
    * TakeOrderedAndProject, no full sort
    * (reference: pipeline_runlog.py:137-172). */
  def recentRunIds(spark: SparkSession, limit: Int = 1,
      tableName: String = "pipeline_runlog"): Seq[Int] =
    spark.read.table(quotedNames(spark, tableName)._1)
      .orderBy(desc("datetime"))
      .select("run_id")
      .limit(limit)
      .collect()
      .map(_.getInt(0))
      .toSeq

  def lastRunId(spark: SparkSession, tableName: String = "pipeline_runlog"): Option[Int] =
    recentRunIds(spark, 1, tableName).headOption

  def penultimateRunId(spark: SparkSession, tableName: String = "pipeline_runlog"): Option[Int] =
    recentRunIds(spark, 2, tableName).drop(1).headOption

  /** Render an entry as text (reference: pipeline_runlog.py:341-376). */
  def renderEntry(e: RunlogEntry): String =
    s"""run_id: ${e.runId}
       |desc: ${e.desc}
       |user: ${e.user}
       |datetime: ${e.datetime}
       |pipeline_name: ${e.pipelineName}
       |pipeline_version: ${e.pipelineVersion}
       |config: ${e.config}
       |""".stripMargin

  def writeRunlogFile(spark: SparkSession, e: RunlogEntry, path: String): Unit =
    graft.io.FileOps.writeTextFile(spark, path, renderEntry(e))
}
