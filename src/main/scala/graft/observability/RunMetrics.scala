package graft.observability

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame

/** Measured execution profile of one action: the numbers that decide
  * whether a plan survives a 100× scale-up. `shuffleWriteBytes` is THE
  * scale predictor — input scans parallelise for free, exchanges
  * don't — and watching it per pipeline stage is how the SCALE.md
  * exchange-volume arguments were produced. */
case class RunMetrics(
    rows: Long,
    wallMs: Long,
    stages: Int,
    tasks: Int,
    inputBytes: Long,
    shuffleWriteBytes: Long,
    shuffleReadBytes: Long)

/** Execution-metrics probe: run a frame once and report what the
  * cluster actually did (stages, tasks, input bytes, exchange bytes).
  *
  * The listener aggregates completed-stage task metrics; listener
  * delivery is asynchronous, so after the action the probe polls until
  * the counters go quiet (bounded). Run one measurement at a time per
  * SparkContext — a concurrent job's stages would land in the same
  * counters (the listener cannot attribute stages to jobs without the
  * event-log machinery in [[EventLog]], which is the offline tool for
  * that).
  */
object RunMetricsProbe {

  /** Execute `df.count()` under a metrics listener and return the
    * profile. Eager by design — this is a measurement tool.
    *
    * Noise floor: the count action itself reduces partial counts
    * through one tiny exchange (~50 B per task), so a completely
    * narrow plan still reports a few hundred shuffle bytes. Read
    * kilobytes-and-up as plan shuffle, bytes as the action's own
    * reduce. */
  def measure(df: DataFrame): RunMetrics =
    measureLazy(df.sparkSession, () => df)

  /** [[measure]] with CONSTRUCTION inside the listener window: use for
    * frames whose builder runs eager work (e.g. an eager
    * `localCheckpoint` fence) that a strict argument would execute
    * before the listener attaches — measured to hide a 9.8 MB ranged
    * exchange entirely (SCALE.md ks_path). */
  def measureLazy(
      spark: org.apache.spark.sql.SparkSession,
      mk: () => DataFrame): RunMetrics = {
    val sc = spark.sparkContext
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val input = new AtomicLong
    val sw = new AtomicLong
    val sr = new AtomicLong
    val listener = new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val m = ev.stageInfo.taskMetrics
        if (m != null) {
          stages.incrementAndGet()
          tasks.addAndGet(ev.stageInfo.numTasks)
          input.addAndGet(m.inputMetrics.bytesRead)
          sw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          sr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    }
    sc.addSparkListener(listener)
    try {
      val t0 = System.nanoTime()
      val rows = mk().count()
      val wallMs = (System.nanoTime() - t0) / 1000000L
      // drain: listener events arrive async — wait until the stage
      // counter is stable across two consecutive polls (max ~2 s)
      var last = -1
      var i = 0
      while (i < 40 && stages.get() != last) {
        last = stages.get()
        Thread.sleep(50)
        i += 1
      }
      RunMetrics(rows, wallMs, stages.get(), tasks.get(),
        input.get(), sw.get(), sr.get())
    } finally sc.removeSparkListener(listener)
  }
}
