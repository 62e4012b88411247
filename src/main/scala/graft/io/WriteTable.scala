package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned / clustered table writer.
  *
  * Reference semantics: gcp/io/outputs.py:17-168 (`write_table`) — a
  * BigQuery write with time partitioning, up-to-4-column clustering and
  * partition expiry. Spark-first equivalents:
  *
  *  - time partitioning  → a derived `date_trunc` partition-key column
  *    + `partitionBy` (directory partitioning → partition pruning on
  *    read, the same effect BigQuery's pruning gives);
  *  - clustering         → `sortWithinPartitions` on the clustered
  *    fields (row-group-level min/max stats in parquet give the
  *    data-skipping benefit clustering gives BigQuery);
  *  - partition expiry   → delete partition directories whose key is
  *    older than the retention window (BigQuery expires server-side).
  */
object WriteTable {

  val partitionTypes: Set[String] = Set("hour", "day", "month", "year")
  private val partitionKeyCol = "part_key"

  /** Write `df` to `path` as parquet with optional time partitioning,
    * clustering, and expiry. `mode` as in DataFrameWriter
    * (append | overwrite | error | ignore).
    */
  def writeTable(
      df: DataFrame,
      path: String,
      mode: String = "error",
      partitionCol: Option[String] = None,
      partitionType: Option[String] = None,
      clusteredFields: Seq[String] = Nil,
      partitionExpiryDays: Option[Double] = None): Unit = {

    if (clusteredFields.size > 4)
      throw new IllegalArgumentException(
        s"writeTable: cannot cluster on ${clusteredFields.size} > 4 columns")
    partitionType.foreach { pt =>
      if (!partitionTypes.contains(pt))
        throw new IllegalArgumentException(
          s"writeTable: partitionType '$pt' must be one of ${partitionTypes.mkString(", ")}")
    }

    if (partitionCol.isDefined && df.columns.contains(partitionKeyCol))
      throw new IllegalArgumentException(
        s"writeTable: column name '$partitionKeyCol' is reserved for the " +
          "derived partition key — rename the input column")

    var out = df
    val partitioned = partitionCol.isDefined
    if (partitioned) {
      // BigQuery defaults to day partitioning when only the column is given
      val pt = partitionType.getOrElse("day")
      out = out.withColumn(partitionKeyCol,
        date_format(date_trunc(pt, col(partitionCol.get)),
          "yyyy-MM-dd'T'HH:mm:ss"))
    }

    // REBALANCE(part_key), not repartition(part_key): a plain hash
    // repartition on the partition key alone pins every partition VALUE
    // to exactly one reduce task — at 100 TB with monthly partitions
    // that is one straggler task per ~TB-sized month, the inverse of the
    // small-files problem it solves. RebalancePartitions under AQE keeps
    // rows of a partition value together (few files per directory) but
    // SPLITS oversized values across tasks at the advisory partition
    // size and coalesces undersized ones — file count per directory is
    // bounded by data volume, not by cluster size or key cardinality.
    val spread =
      if (partitioned) out.hint("rebalance", col(partitionKeyCol)) else out
    val clustered =
      if (clusteredFields.nonEmpty)
        // cluster WITHIN partitions: sort so parquet row-group stats are
        // selective on the clustered fields
        (if (partitioned)
          spread.sortWithinPartitions(
            (partitionKeyCol +: clusteredFields).map(col): _*)
        else spread.sortWithinPartitions(clusteredFields.map(col): _*))
      else spread

    var writer = clustered.write.mode(mode).format("parquet")
    if (partitioned) writer = writer.partitionBy(partitionKeyCol)
    writer.save(path)

    partitionExpiryDays.foreach(days =>
      expireOldPartitions(df.sparkSession, path, days))
  }

  /** Delete partition directories whose `part_key` is older than
    * `expiryDays` before now — the reference's
    * partition_expiration_days (outputs.py:158-168) done client-side.
    */
  def expireOldPartitions(
      spark: SparkSession,
      path: String,
      expiryDays: Double,
      nowMillis: Long = System.currentTimeMillis()): Seq[String] = {
    val cutoff = nowMillis - (expiryDays * 24 * 3600 * 1000).toLong
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
    val expired = FileOps.listDir(spark, path)
      .filter(_.contains(s"$partitionKeyCol="))
      .filter { dir =>
        val value = java.net.URLDecoder.decode(
          dir.split(s"$partitionKeyCol=").last, "UTF-8")
        scala.util.Try(
          java.time.LocalDateTime.parse(value, fmt)
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli < cutoff
        ).getOrElse(false)
      }
    expired.foreach(FileOps.deleteFile(spark, _, recursive = true))
    expired
  }

  /** Bucketed catalog table: pre-shuffles rows into `numBuckets` by
    * `bucketCols` at write time so subsequent equi-joins/aggregations
    * on those keys read co-located data and plan WITHOUT an Exchange —
    * the ahead-of-time alternative to shuffling per query. Both sides
    * of a join must be bucketed the same way (same cols, same count).
    */
  def writeBucketedTable(
      df: DataFrame,
      tableName: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      mode: String = "error"): Unit = {
    require(bucketCols.nonEmpty, "writeBucketedTable: need bucket columns")
    require(numBuckets > 0, "writeBucketedTable: numBuckets must be positive")
    var writer = df.write.mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty)
      writer = writer.sortBy(sortCols.head, sortCols.tail: _*)
    writer.saveAsTable(tableName)
  }

  /** Catalog-table variant: saveAsTable with native partitioning on an
    * existing column (no derived key — the catalog tracks partitions).
    */
  def writeCatalogTable(
      df: DataFrame,
      tableName: String,
      mode: String = "error",
      partitionBy: Seq[String] = Nil,
      clusteredFields: Seq[String] = Nil): Unit = {
    if (clusteredFields.size > 4)
      throw new IllegalArgumentException(
        s"writeCatalogTable: cannot cluster on ${clusteredFields.size} > 4 columns")
    val out =
      if (clusteredFields.nonEmpty)
        df.sortWithinPartitions(clusteredFields.map(col): _*)
      else df
    var writer = out.write.mode(mode)
    if (partitionBy.nonEmpty) writer = writer.partitionBy(partitionBy: _*)
    writer.saveAsTable(tableName)
  }
}
