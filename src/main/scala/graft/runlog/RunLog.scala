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

  /** Create both tables if missing (parquet-backed catalog tables; the
    * reference's DDL at pipeline_runlog.py:73-95). */
  def createRunlogTable(spark: SparkSession, tableName: String = "pipeline_runlog"): Unit = {
    if (!spark.catalog.tableExists(tableName))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], runlogSchema)
        .write.format("parquet").saveAsTable(tableName)
    val reserved = s"${tableName}_reserved_ids"
    if (!spark.catalog.tableExists(reserved))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], reservedIdsSchema)
        .write.format("parquet").saveAsTable(reserved)
  }

  /** Reserve the next run id: max(run_id)+1 over both tables, else 1
    * (reference: pipeline_runlog.py:98-134). */
  def reserveId(spark: SparkSession, tableName: String = "pipeline_runlog"): Int = {
    val reserved = s"${tableName}_reserved_ids"
    val maxMain = maxRunId(spark, tableName)
    val maxRes = maxRunId(spark, reserved)
    val next = math.max(maxMain, maxRes) + 1
    val now = new Timestamp(System.currentTimeMillis())
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(next, now))), reservedIdsSchema)
      .write.mode("append").insertInto(reserved)
    next
  }

  private def maxRunId(spark: SparkSession, table: String): Int =
    if (!spark.catalog.tableExists(table)) 0
    else {
      val r = spark.read.table(table).agg(max("run_id")).collect()(0)
      if (r.isNullAt(0)) 0 else r.getInt(0)
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
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(
        entry.runId, entry.desc, entry.user, entry.datetime,
        entry.pipelineName, entry.pipelineVersion, entry.config))), runlogSchema)
      .write.mode("append").insertInto(tableName)
    entry
  }

  /** Most recent `limit` run ids, newest first — plans as
    * TakeOrderedAndProject, no full sort
    * (reference: pipeline_runlog.py:137-172). */
  def recentRunIds(spark: SparkSession, limit: Int = 1,
      tableName: String = "pipeline_runlog"): Seq[Int] =
    spark.read.table(tableName)
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
