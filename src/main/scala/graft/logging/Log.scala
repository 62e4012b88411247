package graft.logging

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import org.slf4j.LoggerFactory

/** Observability combinators (SURVEY.md §2.12): schema / row-count
  * logging wrappers, timers. The reference implements these as Python
  * decorators (rdsa_utils/logging.py:179-522); Scala-first they are
  * higher-order functions over `DataFrame => DataFrame`.
  */
object Log {
  private val log = LoggerFactory.getLogger("graft")

  /** Custom DEV level between DEBUG and INFO — the reference defines
    * numeric level 15 for pipeline-developer diagnostics
    * (logging.py:19-33). log4j2 levels count downward, so DEV sits at
    * 450 (DEBUG=500, INFO=400). */
  lazy val DevLevel: org.apache.logging.log4j.Level =
    org.apache.logging.log4j.Level.forName("DEV", 450)

  /** Log at DEV level (the reference's `logger.dev`). */
  def dev(message: String): Unit =
    org.apache.logging.log4j.LogManager.getLogger("graft").log(DevLevel, message)

  /** Basic logger init: set the root level, keep console output —
    * reference init_logger_basic (logging.py:36-71). Registers the DEV
    * level as a side effect so `Log.dev` is live. */
  def initLoggerBasic(level: String): Unit = {
    val lvl =
      if (level.equalsIgnoreCase("dev")) DevLevel
      else org.apache.logging.log4j.Level.toLevel(level, org.apache.logging.log4j.Level.INFO)
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(lvl)
    dev("Initialised logger for pipeline. DEV level (450) is available.")
  }

  /** Advanced init: per-logger levels on top of the root level —
    * reference init_logger_advanced (logging.py:74-176), which wires
    * handler/format config; in log4j2 formats live in configuration,
    * so this applies the level map programmatically and is idempotent.
    */
  def initLoggerAdvanced(
      rootLevel: String,
      loggerLevels: Map[String, String] = Map.empty): Unit = {
    initLoggerBasic(rootLevel)
    loggerLevels.foreach { case (name, level) =>
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        name,
        if (level.equalsIgnoreCase("dev")) DevLevel
        else org.apache.logging.log4j.Level.toLevel(level,
          org.apache.logging.log4j.Level.INFO))
    }
  }

  /** Time a block, log a humanised duration, return its value.
    * Reference: rdsa_utils/logging.py:179-204 (codetiming wrapper).
    */
  def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val result = f
    val secs = (System.nanoTime() - t0) / 1e9
    log.info(f"$name took ${humanise(secs)}")
    result
  }

  def humanise(seconds: Double): String =
    if (seconds < 1) f"${seconds * 1000}%.0f ms"
    else if (seconds < 60) f"$seconds%.2f s"
    else f"${(seconds / 60).toInt}m ${(seconds % 60)}%.0f s"

  /** Log the schema tree before/after a transformation.
    * Reference: rdsa_utils/logging.py:262-408 (`log_spark_df_schema`).
    */
  def withSchemaLogging(name: String)(f: DataFrame => DataFrame): DataFrame => DataFrame =
    df => {
      log.info(s"[$name] input schema:\n${df.schema.treeString}")
      val out = f(df)
      log.info(s"[$name] output schema:\n${out.schema.treeString}")
      out
    }

  /** Log row counts before/after a transformation. Caches the input so
    * the count is not recomputed by the transformation; persists the
    * output MEMORY_ONLY and unpersists the input — same choreography as
    * the reference. Eager (two count jobs).
    * Reference: rdsa_utils/logging.py:411-522 (`log_rows_in_spark_df`).
    */
  def withRowCountLogging(name: String)(f: DataFrame => DataFrame): DataFrame => DataFrame =
    df => {
      val cached = df.cache()
      log.info(s"[$name] rows in: ${cached.count()}")
      val out = f(cached).persist(StorageLevel.MEMORY_ONLY)
      log.info(s"[$name] rows out: ${out.count()}")
      cached.unpersist()
      out
    }

  /** Cache + count with timing — the reference's `cache_time_df`.
    * Reference: rdsa_utils/helpers/pyspark.py:1031-1051.
    */
  def cacheTimeDf(df: DataFrame): Unit =
    timed("cache+count")(df.cache().count()): Unit

  /** Log a full (small!) table and optionally raise.
    * Reference: rdsa_utils/logging.py:207-259.
    */
  def printFullTableAndRaiseError(
      df: DataFrame,
      message: String,
      stopPipeline: Boolean = false): Unit = {
    // limit() bounds the scan itself — a count() here would run a full
    // job over the whole input just to cap an error-path debug print.
    val rendered = df.showString(1000, 0, vertical = false)
    log.error(s"$message\n$rendered")
    if (stopPipeline) throw new graft.PipelineError(message)
  }

  /** Warning-emitting wrapper (`add_warning_message_to_function` /
    * `not_undergone_functional_test_warning`).
    * Reference: rdsa_utils/logging.py:525-583.
    */
  def withWarning[A, B](message: String)(f: A => B): A => B = a => {
    log.warn(message)
    f(a)
  }

  private implicit class ShowStringAccess(df: DataFrame) {
    // Dataset.showString is private[sql]; re-derive via show-to-string.
    def showString(numRows: Int, truncate: Int, vertical: Boolean): String = {
      val rows = df.limit(numRows).collect()
      val header = df.columns.mkString(" | ")
      (header +: rows.map(_.toSeq.map(v => if (v == null) "null" else v.toString).mkString(" | "))).mkString("\n")
    }
  }
}
