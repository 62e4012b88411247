package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.DataFrameOps
import graft.{ColumnNotInDataframeError, TableNotFoundError}

/** Option-driven pushdown reader — the engine's main read API.
  *
  * Reference semantics: gcp/io/inputs.py:24-126 (`read_table`) and its
  * SQL builder inputs.py:129-265 (`build_sql_query`). The reference
  * composes a SQL string for the BigQuery connector; Spark-first the
  * same composition is a Catalyst `Column` predicate over any source
  * (parquet, ORC, CSV, catalog table, JDBC) — Catalyst pushes the
  * conjuncts to the scan (visible as PushedFilters), prunes columns
  * via the projection, and prunes partitions when the source is
  * partitioned. No string SQL, no injection surface, format-agnostic.
  */
object ReadTable {

  /** Time units accepted for partition filtering (BigQuery parity). */
  val partitionTypes: Set[String] = Set("hour", "day", "month", "year")

  /** Compose the reference's filter semantics as one Catalyst predicate.
    * Returns None when no filter applies (read everything).
    *
    * - `dateRange` = [lower, upper) on `dateColumn` — reference
    *   build_sql_query date clause (inputs.py:222-228).
    * - `columnFilters`: column -> allowed values, OR within a column,
    *   AND across columns (inputs.py:230-265).
    * - partition trunc-equality or between (inputs.py:193-219).
    */
  def buildFilterCondition(
      dateColumn: Option[String] = None,
      dateRange: Option[(String, String)] = None,
      columnFilters: Map[String, Seq[Any]] = Map.empty,
      partitionColumn: Option[String] = None,
      partitionType: Option[String] = None,
      partitionValue: Option[Either[String, (String, String)]] = None): Option[Column] = {

    val partCond: Option[Column] =
      (partitionColumn, partitionType, partitionValue) match {
        case (Some(pc), Some(pt), Some(pv)) =>
          if (!partitionTypes.contains(pt))
            throw new IllegalArgumentException(
              s"partitionType '$pt' must be one of ${partitionTypes.mkString(", ")}")
          Some(pv match {
            case Left(single) =>
              date_trunc(pt, col(pc)) === date_trunc(pt, lit(single).cast("timestamp"))
            case Right((lo, hi)) =>
              // inclusive range; upper bound snapped to end-of-period by
              // Dates.toInclusiveRange at the caller when desired
              col(pc) >= lit(lo).cast("timestamp") &&
                col(pc) <= lit(hi).cast("timestamp")
          })
        case _ => None
      }

    val dateCond: Option[Column] = (dateColumn, dateRange) match {
      case (Some(dc), Some((lo, hi))) =>
        Some(col(dc) >= lit(lo) && col(dc) < lit(hi))
      case _ => None
    }

    val valueConds: Seq[Column] = columnFilters.toSeq.map { case (c, vs) =>
      require(vs.nonEmpty, s"columnFilters for '$c' must be non-empty")
      vs.map(v => col(c) === lit(v)).reduce(_ || _)
    }

    (partCond.toSeq ++ dateCond.toSeq ++ valueConds).reduceOption(_ && _)
  }

  /** Full reader: source → column check/projection → composed predicate
    * → optional run-id filter → optional struct flattening. All lazy;
    * the filter and projection reach the scan via Catalyst.
    */
  def readTable(
      df: DataFrame,
      columns: Seq[String] = Nil,
      dateColumn: Option[String] = None,
      dateRange: Option[(String, String)] = None,
      columnFilters: Map[String, Seq[Any]] = Map.empty,
      runIdColumn: String = "run_id",
      runId: Option[String] = None,
      flattenStructCols: Boolean = false,
      partitionColumn: Option[String] = None,
      partitionType: Option[String] = None,
      partitionValue: Option[Either[String, (String, String)]] = None): DataFrame = {

    if (columns.nonEmpty) {
      val missing = columns.filterNot(df.columns.contains)
      if (missing.nonEmpty)
        throw new ColumnNotInDataframeError(
          s"readTable: columns ${missing.mkString(", ")} not in table " +
            s"(choose from: ${df.columns.mkString(", ")})")
    }

    val allFilters = columnFilters ++ runId.map(r => runIdColumn -> Seq[Any](r))
    val cond = buildFilterCondition(
      dateColumn, dateRange, allFilters,
      partitionColumn, partitionType, partitionValue)

    var out = cond.fold(df)(df.filter)
    if (columns.nonEmpty) out = out.select(columns.map(col): _*)
    if (flattenStructCols) out = DataFrameOps.convertStructColToColumns(out)
    out
  }

  /** Catalog-table entry point (reference table_exists guard). */
  def readTable(
      spark: SparkSession,
      tableName: String,
      columns: Seq[String],
      dateColumn: Option[String],
      dateRange: Option[(String, String)],
      columnFilters: Map[String, Seq[Any]],
      runIdColumn: String,
      runId: Option[String],
      flattenStructCols: Boolean): DataFrame = {
    if (!spark.catalog.tableExists(tableName))
      throw new TableNotFoundError(s"readTable: $tableName cannot be found")
    readTable(spark.read.table(tableName), columns, dateColumn, dateRange,
      columnFilters, runIdColumn, runId, flattenStructCols)
  }

  /** Parquet-path entry point. */
  def readParquet(
      spark: SparkSession,
      path: String,
      columns: Seq[String] = Nil,
      dateColumn: Option[String] = None,
      dateRange: Option[(String, String)] = None,
      columnFilters: Map[String, Seq[Any]] = Map.empty,
      runIdColumn: String = "run_id",
      runId: Option[String] = None,
      flattenStructCols: Boolean = false): DataFrame =
    readTable(spark.read.parquet(path), columns, dateColumn, dateRange,
      columnFilters, runIdColumn, runId, flattenStructCols)
}
