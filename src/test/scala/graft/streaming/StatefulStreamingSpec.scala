package graft.streaming

import graft.SparkTestBase
import graft.streaming.Streaming.{KeyedDoc, dedupStream}

class StatefulStreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("dedupStream drops repeat fingerprints per key (batch mode)") {
    val docs = Seq(
      KeyedDoc("en", "fp1", "first"),
      KeyedDoc("en", "fp1", "dup of first"),
      KeyedDoc("en", "fp2", "second"),
      KeyedDoc("fr", "fp1", "same fp, other key")).toDS()
    val out = dedupStream(docs).collect()
    assert(out.length == 3)
    assert(out.count(_.key == "en") == 2)
    assert(out.exists(d => d.key == "fr" && d.payload == "same fp, other key"))
  }

  test("dedupStream keeps state across streaming micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString
    Seq(KeyedDoc("k", "a", "one"), KeyedDoc("k", "b", "two")).toDS()
      .write.mode("overwrite").parquet(s"$dir/in")
    // second file arrives with one duplicate + one new
    Seq(KeyedDoc("k", "a", "one again"), KeyedDoc("k", "c", "three")).toDS()
      .write.mode("append").parquet(s"$dir/in")
    val streamed = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[KeyedDoc]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in").as[KeyedDoc]
    val q = dedupStream(streamed).writeStream
      .format("memory").queryName("graft_dedup_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val fingerprints = spark.table("graft_dedup_stream")
      .select("fingerprint").as[String].collect().sorted.toSeq
    assert(fingerprints == Seq("a", "b", "c")) // "a" emitted once only
  }

  test("runningCounts accumulates per key") {
    val out = Streaming.runningCounts(
      Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDS()).collect().toMap
    assert(out == Map("a" -> 2L, "b" -> 1L))
  }
}
