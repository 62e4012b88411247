package graft.observability

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** Directory-sweep wrappers (reference parser.py:209-428). */
class EventLogSweepSpec extends SparkTestBase {

  private def mkLog(base: String, id: String, name: String, lines: Seq[String],
      fileName: String => String = i => s"events_1_spark-$i"): String = {
    val dir = Paths.get(s"$base/eventlog_v2_spark-$id")
    Files.createDirectories(dir)
    val p = dir.resolve(fileName(id))
    Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    p.toString
  }

  private def runLog(app: String, ts: Long, end: Long): Seq[String] = Seq(
    s"""{"Event":"SparkListenerApplicationStart","Timestamp":$ts,"App Name":"$app"}""",
    """{"Event":"SparkListenerExecutorAdded","Executor Info":{"Total Cores":2}}""",
    """{"Event":"SparkListenerStageSubmitted","Properties":{"spark.executor.memory":"2g","spark.executor.cores":"2"}}""",
    s"""{"Event":"SparkListenerApplicationEnd","Timestamp":$end}""")

  test("findLogFiles matches only the rolling-event-log layout") {
    val base = Files.createTempDirectory("sweep").toString
    val good = mkLog(base, "a1", "X", runLog("X", 10, 20))
    mkLog(base, "a1", "X", Seq("status"), _ => "appstatus_1") // wrong file name
    Files.write(Paths.get(s"$base/events_1_spark-loose"), "loose".getBytes) // wrong dir
    Files.createDirectories(Paths.get(s"$base/otherdir-a2"))
    Files.write(Paths.get(s"$base/otherdir-a2/events_1_spark-a2"), "x".getBytes)
    val found = EventLogSweep.findLogFiles(spark, base)
    assert(found.size == 1 && found.head.endsWith(good.stripPrefix("/")))
  }

  test("processLogs parses every run, skips corrupt logs with errors recorded") {
    val base = Files.createTempDirectory("sweep").toString
    mkLog(base, "b1", "App1", runLog("App1", 1000, 61000))
    mkLog(base, "b2", "App2", runLog("App2", 2000, 122000))
    mkLog(base, "bad", "Broken",
      Seq("""{"Event":"SparkListenerApplicationStart","Timestamp":1,"App Name":"Broken"}"""))
    val (logs, errs) = EventLogSweep.processLogs(spark, base)
    assert(logs.size == 2 && errs.size == 1)
    assert(errs.head._1.contains("events_1_spark-bad"))
    val app1 = logs.find(_.pipeline.contains("App1")).get
    assert(app1.total_time_ms == 60000L && app1.total_executors == 1 &&
      app1.total_cores == 2 && app1.total_memory_gb == 2)
    assert(app1.pipeline_cost > 0 && app1.instance_type.nonEmpty)
  }

  test("filterAndSortByAppName: name filter + timestamp order, both directions") {
    val base = Files.createTempDirectory("sweep").toString
    mkLog(base, "c1", "A", runLog("A", 100, 200))
    mkLog(base, "c2", "B", runLog("B", 300, 400))
    mkLog(base, "c3", "A", runLog("A", 500, 600))
    val (logs, _) = EventLogSweep.processLogs(spark, base)
    val latest = EventLogSweep.filterAndSortByAppName(logs)
    assert(latest.map(_.timestamp.get) == Seq(500L, 300L, 100L))
    val oldest = EventLogSweep.filterAndSortByAppName(logs, orderByLatest = false)
    assert(oldest.map(_.timestamp.get) == Seq(100L, 300L, 500L))
    // absent timestamps sort LAST in both directions
    val withMissing = logs :+ logs.head.copy(timestamp = None)
    assert(EventLogSweep.filterAndSortByAppName(withMissing)
      .map(_.timestamp) == Seq(Some(500L), Some(300L), Some(100L), None))
    assert(EventLogSweep.filterAndSortByAppName(withMissing, orderByLatest = false)
      .map(_.timestamp) == Seq(Some(100L), Some(300L), Some(500L), None))
    val onlyA = EventLogSweep.filterAndSortByAppName(logs, appName = Some("A"))
    assert(onlyA.size == 2 && onlyA.forall(_.pipeline.contains("A")))
    assert(EventLogSweep.filterAndSortByAppName(logs, appName = Some("Z")).isEmpty)
  }

  test("logsToDataFrame flattens every metric + cost column (json_normalize parity)") {
    val base = Files.createTempDirectory("sweep").toString
    mkLog(base, "d1", "App", runLog("App", 0, 3600000))
    val (logs, _) = EventLogSweep.processLogs(spark, base)
    val df = EventLogSweep.logsToDataFrame(spark, logs)
    assert(df.count() == 1)
    val cols = df.columns.toSet
    assert(Set("file_path", "pipeline", "timestamp", "total_time_ms",
      "total_cores", "total_memory_gb", "instance_type", "ec2_cost",
      "emr_surcharge", "pipeline_cost", "runtime_hours").subsetOf(cols))
    val r = df.head()
    assert(r.getAs[Long]("total_time_ms") == 3600000L)
  }
}
