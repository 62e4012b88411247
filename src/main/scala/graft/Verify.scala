package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def writeJson(path: String, kv: Iterable[(String, String)]): Unit =
    Files.writeString(Paths.get(path),
      kv.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))

  /** Run every query, writing results under `outDir` and — the part a
    * round regression depends on — turning each THROWN query into a
    * durable red artifact: `$outDir/_failed.json` maps query name →
    * exception class + message ({} when all green). r10's testdata
    * regeneration broke 5 queries and the correctness file silently
    * SHRANK (the old catch printed to stderr and moved on); the
    * declared/recorded/failed summary + artifact make that absence
    * loud. Returns the failure map for the caller/spec. */
  private[graft] def runQueries(
      spark: SparkSession,
      queries: Map[String, (SparkSession, String) => DataFrame],
      sfDir: String,
      outDir: String): Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    queries.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // OUTPUT-SHAPE GATE (r14, SparkEntry header convention): the
        // driver's pandas-based comparator cannot sort LIST/STRUCT/MAP
        // columns (q_keyword_tag crashed it in r13), so a nested
        // top-level column is a red artifact HERE, not a driver crash.
        val nested = df.schema.fields.filter(_.dataType match {
          case _: org.apache.spark.sql.types.ArrayType => true
          case _: org.apache.spark.sql.types.MapType => true
          case _: org.apache.spark.sql.types.StructType => true
          case _ => false
        })
        if (nested.nonEmpty)
          throw new IllegalStateException(
            "non-scalar result columns (explode or array_join before returning): " +
              nested.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", "))
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        failed(name) = s"${e.getClass.getName}: ${e.getMessage}"
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    writeJson(s"$outDir/_failed.json", failed)
    val declared = queries.size
    println(s"[verify] declared=$declared recorded=${declared - failed.size} " +
      s"failed=${failed.size}" +
      (if (failed.isEmpty) "" else failed.keys.mkString(" (", ", ", ")")))
    failed.toMap
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // catalog-table queries need a writable, cwd-independent warehouse
      .config("spark.sql.warehouse.dir", "/root/repo/target/verify_warehouse")
      // events.parquet has shipped as TIMESTAMP(NANOS) in some testdata
      // generations; this knob surfaces that shape as LongType nanos,
      // which DataFrameOps.normalizeEventTs converts (harmless when the
      // current files are timestamp[us])
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("javax.jdo.option.ConnectionURL",
        "jdbc:derby:;databaseName=/root/repo/target/verify_metastore;create=true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run (same contract as Bench/
    // Scale) — single-operator iteration without the ~100 s full sweep.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queries = only.fold(SparkEntry.queries)(names => {
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"SPARK_GRAFT_ONLY names unknown queries: ${unknown.mkString(", ")}")
      SparkEntry.queries.filter { case (n, _) => names(n) }
    })
    runQueries(spark, queries, sfDir, outDir)
    writeJson(s"$outDir/oracle_sql.json",
      only.fold(SparkEntry.oracleSql)(names => SparkEntry.oracleSql.filter { case (n, _) => names(n) }))
    spark.stop()
  }
}
