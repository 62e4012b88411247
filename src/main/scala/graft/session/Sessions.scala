package graft.session

import org.apache.spark.sql.SparkSession

/** T-shirt-sized SparkSession builder.
  *
  * Reproduces the size matrix of the reference's `create_spark_session`
  * (reference: rdsa_utils/helpers/pyspark.py:647-796): executor
  * memory/cores/max-executors/shuffle-partitions per size, with AQE,
  * dynamic allocation + shuffle tracking always on.
  *
  * At 100 TB these presets are starting points: AQE re-plans shuffle
  * partition counts at runtime, so `shuffle.partitions` here is a cap,
  * not a hard-coded fan-out.
  */
object Sessions {

  sealed abstract class Size(
      val executorMemory: String,
      val executorCores: Int,
      val maxExecutors: Int,
      val shufflePartitions: Int,
      val memoryOverhead: Option[String],
  )
  case object Small extends Size("1g", 1, 3, 12, None)
  case object Medium extends Size("6g", 3, 3, 18, None)
  case object Large extends Size("10g", 5, 5, 200, Some("1g"))
  case object ExtraLarge extends Size("20g", 5, 12, 240, Some("2g"))

  def sizeFromString(s: String): Size = s.toLowerCase match {
    case "small"                 => Small
    case "medium"                => Medium
    case "large"                 => Large
    case "extra-large" | "xl"    => ExtraLarge
    case other =>
      throw new IllegalArgumentException(
        s"Unknown session size '$other'; expected one of small, medium, large, extra-large")
  }

  /** Streaming state-store provider knob for [[createSparkSession]].
    * `"rocksdb"` pins `spark.sql.streaming.stateStore.providerClass` to
    * the RocksDB provider — the corpus-scale choice for the stateful
    * dedup operators ([[graft.streaming.Streaming.nearDedupStream]]):
    * the default HDFS-backed store holds every key's state on-heap,
    * RocksDB spills to local disk. `"default"` (or any unknown value →
    * IllegalArgumentException) leaves Spark's default provider in
    * place. The conf is read per streaming query at start, so it only
    * affects queries started on this session. Exercised end-to-end by
    * StatefulStreamingSpec's pinned RocksDB run. */
  private[session] val RocksDbProviderClass =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Build a session with the given size preset plus extra configs.
    * `master` defaults to whatever the environment supplies (cluster
    * deploy) but can be forced to local[N] for tests. `stateStore`
    * opts streaming state into RocksDB (see [[RocksDbProviderClass]]).
    */
  def createSparkSession(
      appName: String = "graft",
      size: Size = Medium,
      extraConfigs: Map[String, String] = Map.empty,
      master: Option[String] = None,
      enableHive: Boolean = false,
      stateStore: String = "default",
  ): SparkSession = {
    require(stateStore == "default" || stateStore == "rocksdb",
      s"createSparkSession: stateStore must be 'default' or 'rocksdb', got '$stateStore'")
    var b = SparkSession
      .builder()
      .appName(appName)
      .config("spark.executor.memory", size.executorMemory)
      .config("spark.executor.cores", size.executorCores.toString)
      .config("spark.dynamicAllocation.maxExecutors", size.maxExecutors.toString)
      .config("spark.sql.shuffle.partitions", size.shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.dynamicAllocation.enabled", "true")
      .config("spark.dynamicAllocation.shuffleTracking.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    size.memoryOverhead.foreach(o => b = b.config("spark.executor.memoryOverhead", o))
    if (stateStore == "rocksdb")
      b = b.config("spark.sql.streaming.stateStore.providerClass", RocksDbProviderClass)
    master.foreach(m => b = b.config("spark.master", m))
    extraConfigs.foreach { case (k, v) => b = b.config(k, v) }
    if (enableHive) b = b.enableHiveSupport()
    b.getOrCreate()
  }

  /** Local test/bench session: local[n], n shuffle partitions, AQE on.
    * Mirrors the reference test fixture (rdsa_utils/test_utils.py:19-37)
    * but sized for this container.
    */
  def localSession(
      appName: String = "graft-local",
      cores: Int = 2,
      shufflePartitions: Int = 1,
      extraConfigs: Map[String, String] = Map.empty,
  ): SparkSession = {
    var b = SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extraConfigs.foreach { case (k, v) => b = b.config(k, v) }
    b.getOrCreate()
  }
}
