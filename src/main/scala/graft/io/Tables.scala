package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{ColumnNotInDataframeError, DataframeEmptyError, TableNotFoundError}

/** Table + CSV IO (SURVEY.md §2.3).
  *
  * Catalog-table helpers follow the reference's cdp/io surface
  * (load_and_validate_table, insert_df_to_hive_table, …) but are written
  * against the generic Spark catalog so they work with Hive, in-memory
  * derby, or any V2 catalog unchanged.
  */
object Tables {

  /** Shared keep→drop→rename column pipeline (strict: missing columns
    * raise), used by every reader. Order matches the reference
    * (rdsa_utils/helpers/pyspark.py:895-928; cdp/io/input.py:232-265).
    */
  def applyColumnPipeline(
      df: DataFrame,
      keepColumns: Seq[String] = Nil,
      dropColumns: Seq[String] = Nil,
      renameColumns: Map[String, String] = Map.empty): DataFrame = {
    var d = df
    if (keepColumns.nonEmpty) {
      val missing = keepColumns.filterNot(d.columns.contains)
      if (missing.nonEmpty)
        throw new ColumnNotInDataframeError(
          s"keep_columns: ${missing.mkString(", ")} not in dataframe")
      d = d.select(keepColumns.map(col): _*)
    }
    dropColumns.foreach { c =>
      if (!d.columns.contains(c))
        throw new ColumnNotInDataframeError(s"drop_columns: $c not in dataframe")
      d = d.drop(c)
    }
    renameColumns.foreach { case (from, to) =>
      if (!d.columns.contains(from))
        throw new ColumnNotInDataframeError(s"rename_columns: $from not in dataframe")
      d = d.withColumnRenamed(from, to)
    }
    d
  }

  /** CSV scan + column pipeline. `header=true` default like the
    * reference; extra reader options pass through.
    * Reference: rdsa_utils/helpers/pyspark.py:799-929.
    */
  def loadCsv(
      spark: SparkSession,
      filepath: String,
      keepColumns: Seq[String] = Nil,
      renameColumns: Map[String, String] = Map.empty,
      dropColumns: Seq[String] = Nil,
      options: Map[String, String] = Map.empty): DataFrame = {
    var df = spark.read
      .options(Map("header" -> "true") ++ options)
      .csv(filepath)
    // multiLine leaves a trailing \r on the last header of CRLF files —
    // same workaround as the reference (helpers/pyspark.py:889-892)
    if (options.get("multiLine").exists(_.equalsIgnoreCase("true"))) {
      val last = df.columns.last
      if (last.endsWith("\r"))
        df = df.withColumnRenamed(last, last.stripSuffix("\r"))
    }
    applyColumnPipeline(df, keepColumns, dropColumns, renameColumns)
  }

  /** Catalog-table read with validation + column pipeline + optional
    * post-filter re-validation. `filter_cond` stays a Catalyst filter so
    * pushdown applies. Reference: rdsa_utils/cdp/io/input.py:121-292.
    */
  def loadAndValidateTable(
      spark: SparkSession,
      tableName: String,
      skipValidation: Boolean = false,
      errOnEmpty: Boolean = true,
      filterCond: Option[String] = None,
      keepColumns: Seq[String] = Nil,
      renameColumns: Map[String, String] = Map.empty,
      dropColumns: Seq[String] = Nil): DataFrame = {
    if (!spark.catalog.tableExists(tableName))
      throw new TableNotFoundError(s"Table $tableName not found in catalog")
    var df = spark.read.table(tableName)
    df = applyColumnPipeline(df, keepColumns, dropColumns, renameColumns)
    if (!skipValidation && errOnEmpty && df.isEmpty)
      throw new DataframeEmptyError(s"Table $tableName is empty after load")
    filterCond.foreach { cond =>
      df = df.filter(expr(cond))
      if (!skipValidation && errOnEmpty && df.isEmpty)
        throw new DataframeEmptyError(
          s"Table $tableName is empty after filter '$cond'")
    }
    df
  }

  /** Current database / table listing / three-part-name split.
    * Reference: rdsa_utils/cdp/io/input.py:14-118.
    */
  def getCurrentDatabase(spark: SparkSession): String = spark.catalog.currentDatabase

  def getTablesInDatabase(spark: SparkSession, database: Option[String] = None): Seq[String] = {
    val db = database.getOrElse(spark.catalog.currentDatabase)
    spark.catalog.listTables(db).collect().map(_.name).toSeq
  }

  /** Column names of a catalog table, in schema order — reference
    * gcp/helpers/gcp_utils.py:34-40 (get_table_columns). Accepts any
    * identifier [[extractDatabaseName]] accepts. */
  def tableColumns(spark: SparkSession, tableName: String): Seq[String] = {
    val (db, tbl) = extractDatabaseName(spark, tableName)
    spark.catalog.listColumns(s"$db.$tbl").collect().map(_.name).toSeq
  }

  /** Split `catalog.db.table` / `db.table` / `table` (defaulting to the
    * current database). Returns (database, table). */
  def extractDatabaseName(spark: SparkSession, tableIdentifier: String): (String, String) =
    tableIdentifier.split('.') match {
      case Array(t)        => (spark.catalog.currentDatabase, t)
      case Array(d, t)     => (d, t)
      case Array(_, d, t)  => (d, t)
      case _ =>
        throw new IllegalArgumentException(
          s"extractDatabaseName: cannot parse table identifier '$tableIdentifier'")
    }

  /** DataFrame → catalog table with overwrite/append, missing-column
    * null-fill cast to the table's types, column reorder to table order,
    * and optional repartition (by count or column) before the write.
    * Reference: rdsa_utils/cdp/io/output.py:33-228.
    */
  def insertDfToTable(
      spark: SparkSession,
      df: DataFrame,
      tableName: String,
      overwrite: Boolean = false,
      fillMissingCols: Boolean = false,
      repartitionN: Option[Int] = None,
      repartitionCol: Option[String] = None): Unit = {
    if (!spark.catalog.tableExists(tableName)) {
      // New table: plain saveAsTable.
      val out = repartitioned(df, repartitionN, repartitionCol)
      out.write.mode(if (overwrite) "overwrite" else "append").saveAsTable(tableName)
      return
    }
    val tableSchema = spark.read.table(tableName).schema
    val tableCols = tableSchema.fieldNames.toSeq
    var d = df
    val missing = tableCols.filterNot(d.columns.contains)
    if (missing.nonEmpty) {
      if (!fillMissingCols)
        throw new ColumnNotInDataframeError(
          s"insertDfToTable: dataframe lacks table columns ${missing.mkString(", ")} " +
            "(set fillMissingCols=true to null-fill)")
      missing.foreach { c =>
        val dt = tableSchema(c).dataType
        d = d.withColumn(c, lit(null).cast(dt))
      }
    }
    val extra = d.columns.filterNot(tableCols.contains)
    if (extra.nonEmpty)
      throw new ColumnNotInDataframeError(
        s"insertDfToTable: dataframe has columns not in table: ${extra.mkString(", ")}")
    d = d.select(tableCols.map(col): _*)
    d = repartitioned(d, repartitionN, repartitionCol)
    d.write.mode(if (overwrite) "overwrite" else "append").insertInto(tableName)
  }

  private def repartitioned(
      df: DataFrame,
      n: Option[Int],
      c: Option[String]): DataFrame = (n, c) match {
    case (Some(k), Some(cc)) => df.repartition(k, col(cc))
    case (Some(k), None)     => df.repartition(k)
    case (None, Some(cc))    => df.repartition(col(cc))
    case (None, None)        => df
  }

  /** Write then read back filtered on `run_id` — round-trips through the
    * table relying on predicate pushdown for the read.
    * Reference: rdsa_utils/cdp/io/output.py:231-331.
    */
  def writeAndReadTable(
      spark: SparkSession,
      df: DataFrame,
      tableName: String,
      runIdCol: String,
      runId: String,
      overwrite: Boolean = false): DataFrame = {
    insertDfToTable(spark, df, tableName, overwrite = overwrite, fillMissingCols = true)
    loadAndValidateTable(spark, tableName, filterCond = Some(s"$runIdCol = '$runId'"))
  }

  /** Run an ad-hoc SQL query against the session catalog and return
    * the result — the engine-local analogue of the reference's
    * run_bq_query (gcp/helpers/gcp_utils.py), which submits SQL to
    * BigQuery and returns the result handle. */
  def runSqlQuery(spark: SparkSession, sql: String): DataFrame = spark.sql(sql)

  /** Refresh cached metadata for a table after external writes — the
    * engine's analogue of the reference's
    * `invalidate_impala_metadata` (cdp/helpers/impala.py:10-78):
    * Spark caches file listings and schema per table; refreshing
    * makes subsequently planned queries see data written by other
    * engines/processes. */
  def refreshTableMetadata(spark: SparkSession, tableName: String): Unit = {
    if (!spark.catalog.tableExists(tableName))
      throw new TableNotFoundError(s"refreshTableMetadata: $tableName not found")
    spark.catalog.refreshTable(tableName)
  }

  /** Truncate an "external" table while preserving schema (and partition
    * structure): drop all partitions if partitioned, else overwrite with
    * an empty frame of the same schema.
    * Reference: rdsa_utils/helpers/pyspark.py:932-1028.
    */
  def truncateExternalTable(spark: SparkSession, tableIdentifier: String): Unit = {
    if (!spark.catalog.tableExists(tableIdentifier))
      throw new TableNotFoundError(s"Table $tableIdentifier not found")
    val partitions =
      try spark.sql(s"SHOW PARTITIONS $tableIdentifier").collect().map(_.getString(0))
      catch { case _: Exception => Array.empty[String] }
    if (partitions.nonEmpty) {
      partitions.foreach { p =>
        val spec = p
          .split('/')
          .map { kv =>
            val Array(k, v) = kv.split("=", 2)
            s"$k='$v'"
          }
          .mkString(", ")
        spark.sql(s"ALTER TABLE $tableIdentifier DROP IF EXISTS PARTITION ($spec)")
      }
    } else {
      val schema = spark.read.table(tableIdentifier).schema
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      empty.write.mode("overwrite").insertInto(tableIdentifier)
    }
  }
}
