package graft.observability

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession

import graft.io.FileOps

/** Spark event-log metrics parser.
  *
  * Reference semantics: helpers/pyspark_log_parser/parser.py:17-206 —
  * fold over the JSON-lines event log (spark.eventLog.enabled=true)
  * extracting application runtime, executor count/cores and per-
  * executor memory. Uses jackson (already on the Spark classpath), no
  * extra dependency.
  */
object EventLogParser {

  case class LogSummary(
      timestamp: Option[Long],
      pipelineName: Option[String],
      startTime: Option[Long],
      endTime: Option[Long],
      totalTimeMs: Long,
      totalExecutors: Int,
      totalCores: Int,
      memoryPerExecutorGb: Int,
      totalMemoryGb: Int)

  private val mapper = new ObjectMapper()

  /** parser.py convert_value: ms→minutes, ns→minutes, bytes→MB. */
  def convertValue(value: Double, unit: String): Double = unit match {
    case "ms"    => value / 60000.0
    case "ns"    => value / 6e10
    case "bytes" => value / (1024.0 * 1024.0)
    case _       => value
  }

  /** Strip a trailing size unit ("4g" → 4). Zero on anything odd. */
  private def gigs(s: String): Int =
    scala.util.Try(s.stripSuffix("g").stripSuffix("G").toInt).getOrElse(0)

  /** Fold the event stream into the reference's summary metrics
    * (parser.py:52-206). Throws when start or end time is absent, like
    * the reference. */
  def parseEvents(jsonLines: Iterator[String]): LogSummary = {
    var timestamp: Option[Long] = None
    var pipelineName: Option[String] = None
    var endTime: Option[Long] = None
    var totalExecutors = 0
    var totalCores = 0
    var memoryPerExecutor = 0
    var totalMemory = 0

    jsonLines.filter(_.trim.nonEmpty).foreach { line =>
      val node: JsonNode = mapper.readTree(line)
      Option(node.get("Event")).map(_.asText()) match {
        case Some("SparkListenerApplicationStart") =>
          timestamp = Option(node.get("Timestamp")).map(_.asLong())
          pipelineName = Option(node.get("App Name")).map(_.asText())
        case Some("SparkListenerApplicationEnd") =>
          endTime = Option(node.get("Timestamp")).map(_.asLong())
        case Some("SparkListenerExecutorAdded") =>
          totalExecutors += 1
          totalCores += Option(node.get("Executor Info"))
            .flatMap(i => Option(i.get("Total Cores"))).map(_.asInt()).getOrElse(0)
        case Some("SparkListenerStageSubmitted") =>
          Option(node.get("Properties")).foreach { props =>
            val mem = Option(props.get("spark.executor.memory"))
              .map(_.asText()).getOrElse("0g")
            val overhead = Option(props.get("spark.yarn.executor.memoryOverhead"))
              .map(_.asText()).getOrElse("0g")
            memoryPerExecutor = gigs(mem) + gigs(overhead)
            totalMemory = memoryPerExecutor * totalExecutors
            Option(props.get("spark.executor.cores")).map(_.asText()).foreach { c =>
              totalCores = scala.util.Try(c.toInt).getOrElse(0) * totalExecutors
            }
          }
        case _ => ()
      }
    }

    val start = timestamp
    if (start.isEmpty || endTime.isEmpty)
      throw new IllegalArgumentException(
        "Both Start Time and End Time must be present in the log data.")

    LogSummary(timestamp, pipelineName, start, endTime,
      endTime.get - start.get, totalExecutors, totalCores,
      memoryPerExecutor, totalMemory)
  }

  /** Parse an event-log file (any FileSystem scheme). Handles both the
    * single-JSON-array form and JSON-lines form. */
  def parseLogFile(spark: SparkSession, path: String): LogSummary = {
    val content = FileOps.readTextFile(spark, path).trim
    if (content.startsWith("["))
      parseEvents(mapper.readTree(content).elements().asScala.map(_.toString))
    else parseEvents(content.linesIterator)
  }
}

/** EC2 / EMR cost model for a parsed pipeline run.
  *
  * Reference semantics: helpers/pyspark_log_parser/ec2_pricing.py —
  * spec inference from the instance-type naming convention
  * (:201-287), cheapest-fit instance matching (:407-461), and the
  * flat 25% EMR surcharge (:16-46). The packaged price table mirrors
  * the reference's cached pricing DB with public on-demand rates
  * (us-east-1, approximate — same role as the reference's bundled
  * sqlite snapshot).
  */
object Ec2Pricing {

  case class InstanceType(
      instanceType: String,
      family: String,
      vcpu: Int,
      memoryGb: Int,
      ec2Price: Double) {
    def emrPrice: Double = emrSurcharge(ec2Price)
  }

  case class CostReport(
      memoryRequestedGb: Int,
      coresRequested: Int,
      instance: InstanceType,
      runtimeMs: Long,
      runtimeHours: Double,
      ec2Cost: Double,
      emrSurcharge: Double,
      pipelineCost: Double,
      costPerHour: Double,
      surchargeApplied: Boolean)

  /** Flat 25% on-top-of-EC2 EMR surcharge (ec2_pricing.py:33-45). */
  def emrSurcharge(ec2Price: Double, rate: Double = 0.25): Double =
    ec2Price * (1 + rate)

  // size multiplier → vCPU (ec2_pricing.py:216-233)
  private val sizeVcpu = Map(
    "nano" -> 2, "micro" -> 2, "small" -> 2, "medium" -> 2, "large" -> 2,
    "xlarge" -> 4, "2xlarge" -> 8, "3xlarge" -> 12, "4xlarge" -> 16,
    "8xlarge" -> 32, "9xlarge" -> 36, "12xlarge" -> 48, "16xlarge" -> 64,
    "18xlarge" -> 72, "24xlarge" -> 96, "metal" -> 96)

  // family → (GB per vCPU, category, $ per vCPU-hour on-demand)
  private val familySpecs = Map(
    "t3"   -> (2, "General Purpose", 0.0416),
    "t4g"  -> (2, "General Purpose", 0.0336),
    "m4"   -> (4, "General Purpose", 0.05),
    "m5"   -> (4, "General Purpose", 0.048),
    "m5a"  -> (4, "General Purpose", 0.043),
    "m5d"  -> (4, "General Purpose", 0.0565),
    "m6a"  -> (4, "General Purpose", 0.0432),
    "r4"   -> (8, "Memory optimised", 0.0665),
    "r5"   -> (8, "Memory optimised", 0.063),
    "r5a"  -> (8, "Memory optimised", 0.0565),
    "r5b"  -> (8, "Memory optimised", 0.0745),
    "r6a"  -> (8, "Memory optimised", 0.0567),
    "x2gd" -> (16, "Memory optimised", 0.0835),
    "c4"   -> (2, "Compute optimised", 0.05),
    "c5"   -> (2, "Compute optimised", 0.0425),
    "c5a"  -> (2, "Compute optimised", 0.0385),
    "c6a"  -> (2, "Compute optimised", 0.0383))

  /** Infer vCPU/memory/category from the type name, None if unknown —
    * mirrors extract_instance_specs (ec2_pricing.py:201-287). */
  def extractInstanceSpecs(instanceType: String): Option[InstanceType] = {
    val re = raw"([a-z]+\d+[a-z]*?)\.([a-z0-9]+)".r
    instanceType match {
      case re(family, size) =>
        for {
          (memRatio, category, perVcpu) <- familySpecs.get(family)
          vcpu <- sizeVcpu.get(size)
        } yield InstanceType(instanceType, category, vcpu, vcpu * memRatio,
          math.rint(perVcpu * vcpu * 10000) / 10000)
      case _ => None
    }
  }

  /** The packaged catalog: every family × common size. */
  lazy val catalog: Seq[InstanceType] = (for {
    family <- familySpecs.keys
    size <- Seq("large", "xlarge", "2xlarge", "4xlarge", "8xlarge",
      "12xlarge", "16xlarge", "24xlarge")
    inst <- extractInstanceSpecs(s"$family.$size")
  } yield inst).toSeq.sortBy(_.instanceType)

  /** User-supplied rates table — the refreshable analogue of the
    * reference's live pricing DB (init_aws_ec2_db.py:16-157
    * fetch_from_aws / update_pricing_data) without the AWS API
    * dependency: read `(instance_type, hourly_usd[, vcpu,
    * memory_gb])` from a CSV (header row) or parquet path on any
    * Hadoop-visible filesystem and return an instance catalog to pass
    * as [[pipelineCost]]'s / [[matchingInstance]]'s `instances`.
    * vcpu/memory fall back to name inference
    * ([[extractInstanceSpecs]]); rows that are neither inferable nor
    * explicitly specced fail loudly — a silently skipped row would
    * skew cheapest-fit matching.
    *
    * `format`: "parquet", "csv", or "" (default) to infer — ".parquet"
    * suffix → parquet, anything else tries parquet FIRST and falls
    * back to CSV-with-header (an extensionless parquet DIRECTORY must
    * never be silently parsed as CSV; a real CSV is not valid parquet,
    * so the probe order is safe). vcpu/memory_gb parse through Double
    * ("8.0" and "8" both mean 8) with a descriptive error on junk. */
  def loadRates(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      format: String = ""): Seq[InstanceType] = {
    require(Seq("", "csv", "parquet").contains(format),
      s"loadRates: format must be csv, parquet, or empty (infer), got '$format'")
    def readCsv() = spark.read.option("header", "true").csv(path)
    val df = format match {
      case "parquet" => spark.read.parquet(path)
      case "csv" => readCsv()
      case _ if path.endsWith(".parquet") => spark.read.parquet(path)
      case _ =>
        // try-parquet-then-csv: footer validation makes a CSV fail fast
        // here, while an extensionless parquet directory reads correctly
        // instead of being mis-parsed as CSV
        try {
          val p = spark.read.parquet(path)
          p.schema // force plan resolution (schema is read eagerly anyway)
          p
        } catch { case _: org.apache.spark.SparkException |
            _: org.apache.spark.sql.AnalysisException => readCsv() }
    }
    val cols = df.columns.toSet
    require(cols.contains("instance_type") && cols.contains("hourly_usd"),
      s"loadRates: need instance_type + hourly_usd columns, got ${df.columns.mkString(", ")}")
    val hasSpecs = cols.contains("vcpu") && cols.contains("memory_gb")
    def parseSpec(raw: Any, field: String, inst: String): Int =
      try raw.toString.toDouble.toInt
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"loadRates: $field '$raw' for '$inst' is not numeric") }
    val rows = df.collect() // a rates table is catalog-sized by contract
    rows.toSeq.map { r =>
      val name = r.getAs[Any]("instance_type").toString
      val price = r.getAs[Any]("hourly_usd").toString.toDouble
      val inferred = extractInstanceSpecs(name)
      val explicit =
        if (hasSpecs && r.getAs[Any]("vcpu") != null && r.getAs[Any]("memory_gb") != null)
          Some((parseSpec(r.getAs[Any]("vcpu"), "vcpu", name),
            parseSpec(r.getAs[Any]("memory_gb"), "memory_gb", name)))
        else None
      (explicit, inferred) match {
        case (Some((v, m)), i) =>
          InstanceType(name, i.map(_.family).getOrElse("Custom"), v, m, price)
        case (None, Some(i)) => i.copy(ec2Price = price)
        case (None, None) => throw new IllegalArgumentException(
          s"loadRates: cannot infer specs for '$name' — add vcpu/memory_gb columns")
      }
    }.sortBy(_.instanceType)
  }

  /** Cheapest instance meeting the requirements
    * (ec2_pricing.py:407-461). */
  def matchingInstance(
      memoryGb: Int,
      cores: Int,
      instances: Seq[InstanceType] = catalog): InstanceType = {
    val valid = instances.filter(i => i.memoryGb >= memoryGb && i.vcpu >= cores)
    if (valid.isEmpty)
      throw new IllegalArgumentException(
        s"No suitable instance type found for ${memoryGb}GB memory and $cores cores.")
    valid.minBy(_.ec2Price)
  }

  /** Minimal HTML cost report — reference
    * pyspark_log_parser/report.py:17-76 renders the same summary +
    * cost tables for pipeline owners. */
  def htmlReport(summary: EventLogParser.LogSummary, report: CostReport): String = {
    def row(k: String, v: Any) = s"<tr><td>$k</td><td>$v</td></tr>"
    s"""<html><head><title>Pipeline cost report</title></head><body>
       |<h1>${summary.pipelineName.getOrElse("pipeline")}</h1>
       |<h2>Run metrics</h2><table>
       |${row("Total time (ms)", summary.totalTimeMs)}
       |${row("Executors", summary.totalExecutors)}
       |${row("Total cores", summary.totalCores)}
       |${row("Memory / executor (GB)", summary.memoryPerExecutorGb)}
       |${row("Total memory (GB)", summary.totalMemoryGb)}
       |</table>
       |<h2>Cost estimate</h2><table>
       |${row("Instance", report.instance.instanceType)}
       |${row("Family", report.instance.family)}
       |${row("EC2 $/h", report.instance.ec2Price)}
       |${row("EMR $/h", report.costPerHour)}
       |${row("Runtime (h)", report.runtimeHours)}
       |${row("EC2 cost", report.ec2Cost)}
       |${row("EMR surcharge", report.emrSurcharge)}
       |${row("Total cost", report.pipelineCost)}
       |</table></body></html>""".stripMargin
  }

  /** Reference calculate_pipeline_cost (ec2_pricing.py:48-193). */
  def pipelineCost(
      summary: EventLogParser.LogSummary,
      applyEmrSurcharge: Boolean = true,
      instances: Seq[InstanceType] = catalog): CostReport = {
    val inst = matchingInstance(summary.totalMemoryGb, summary.totalCores, instances)
    val hours = summary.totalTimeMs / 3600000.0
    val hourly = if (applyEmrSurcharge) inst.emrPrice else inst.ec2Price
    val ec2Cost = inst.ec2Price * hours
    val total = hourly * hours
    CostReport(
      memoryRequestedGb = summary.totalMemoryGb,
      coresRequested = summary.totalCores,
      instance = inst,
      runtimeMs = summary.totalTimeMs,
      runtimeHours = math.rint(hours * 10000) / 10000,
      ec2Cost = math.rint(ec2Cost * 10000) / 10000,
      emrSurcharge = math.rint((total - ec2Cost) * 10000) / 10000,
      pipelineCost = math.rint(total * 10000) / 10000,
      costPerHour = hourly,
      surchargeApplied = applyEmrSurcharge)
  }
}

/** Directory-sweep reporting over Spark event logs — the batch loop a
  * platform team runs over a logs bucket to cost every pipeline run.
  *
  * Reference semantics: helpers/pyspark_log_parser/parser.py:209-428
  * (find_pyspark_log_files / process_pyspark_logs /
  * filter_and_sort_logs_by_app_name / logs_to_dataframe). All scheme-
  * generic via Hadoop FileSystem (file://, hdfs://, s3a://, gs://).
  *
  * Scale shape: the sweep is LOG-COUNT-scale, not corpus-scale — a
  * bucket holds hundreds of event logs, each parsed once on the
  * driver exactly as the reference does; the resulting frame is tiny
  * (one row per run). Nothing here touches table data.
  */
object EventLogSweep {

  /** One fully-parsed run: metrics + cheapest-fit cost. */
  case class LogRecord(
      file_path: String,
      pipeline: Option[String],
      timestamp: Option[Long],
      start_time: Option[Long],
      end_time: Option[Long],
      total_time_ms: Long,
      total_executors: Int,
      total_cores: Int,
      memory_per_executor_gb: Int,
      total_memory_gb: Int,
      instance_type: String,
      instance_family: String,
      ec2_price: Double,
      cost_per_hour: Double,
      runtime_hours: Double,
      ec2_cost: Double,
      emr_surcharge: Double,
      pipeline_cost: Double)

  /** find_pyspark_log_files parity (parser.py:209-246): files under
    * `folder` living in an `eventlog_v2_spark-*` directory whose name
    * contains `events_1_spark` (the Spark rolling-event-log layout). */
  def findLogFiles(spark: SparkSession, folder: String): Seq[String] =
    FileOps.walkFiles(spark, folder)
      .filter { p =>
        val parts = p.split('/')
        parts.length >= 2 &&
          parts(parts.length - 2).startsWith("eventlog_v2_spark-") &&
          parts.last.contains("events_1_spark")
      }
      .sorted

  /** process_pyspark_logs parity (parser.py:249-309): find every log
    * under `folder`, parse it, and attach the cheapest-fit cost
    * estimate. Logs that fail to parse (truncated, no app end event)
    * are skipped with their error recorded, never failing the sweep. */
  def processLogs(
      spark: SparkSession,
      folder: String,
      applyEmrSurcharge: Boolean = true): (Seq[LogRecord], Seq[(String, String)]) = {
    val (good, bad) = findLogFiles(spark, folder).partitionMap { path =>
      try {
        val s = EventLogParser.parseLogFile(spark, path)
        val c = Ec2Pricing.pipelineCost(s, applyEmrSurcharge)
        Left(LogRecord(path, s.pipelineName, s.timestamp, s.startTime, s.endTime,
          s.totalTimeMs, s.totalExecutors, s.totalCores, s.memoryPerExecutorGb,
          s.totalMemoryGb, c.instance.instanceType, c.instance.family,
          c.instance.ec2Price, c.costPerHour, c.runtimeHours, c.ec2Cost,
          c.emrSurcharge, c.pipelineCost))
      } catch {
        case e: Exception => Right(path -> String.valueOf(e.getMessage))
      }
    }
    (good, bad)
  }

  /** filter_and_sort_logs_by_app_name parity (parser.py:312-364):
    * optional exact pipeline-name filter, then sort by timestamp
    * (latest first by default; absent timestamps sort last). */
  def filterAndSortByAppName(
      logs: Seq[LogRecord],
      appName: Option[String] = None,
      orderByLatest: Boolean = true): Seq[LogRecord] = {
    val filtered = appName match {
      case Some(n) => logs.filter(_.pipeline.contains(n))
      case None    => logs
    }
    // absent timestamps sort LAST in both directions, so the latest-
    // first branch sorts descending directly instead of reversing an
    // ascending sort (which would put timestamp-less records first)
    if (orderByLatest)
      filtered.sortBy(r => (r.timestamp.isEmpty, -r.timestamp.getOrElse(0L)))
    else
      filtered.sortBy(r => (r.timestamp.isEmpty, r.timestamp.getOrElse(0L)))
  }

  /** logs_to_dataframe parity (parser.py:367-428): one flat row per
    * run (the Spark analogue of pd.json_normalize over the nested
    * metric dicts). */
  def logsToDataFrame(spark: SparkSession, logs: Seq[LogRecord]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    logs.toDF()
  }
}
