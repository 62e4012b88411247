package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Media payloads are opaque `binary` columns carried next to typed
  * metadata — the same physical layout the big multimodal training
  * corpora use in parquet. The Spark-side plumbing (schema, batched
  * per-partition processing, feature schema, partition sizing) is real
  * and tested; the actual image/audio DECODE step is a clearly-marked
  * deterministic STUB (`fakeDecode`) because no media codec libraries
  * exist in this environment — swap `decodeFn` for a real decoder
  * (e.g. javacv / TwelveMonkeys) in production.
  *
  * Scale notes: feature extraction is `mapPartitions` (narrow, no
  * shuffle); binary-heavy tables should be read with a smaller
  * `spark.sql.files.maxPartitionBytes` so one task's batch of blobs
  * fits in executor memory.
  */
object Multimodal {

  /** Canonical multimodal record layout. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("media_type", StringType),     // image | audio | video
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("codec", StringType),
    ))),
  ))

  /** Wrap a text/id DataFrame into the multimodal layout with synthetic
    * binary payloads (utf-8 bytes of the text) — the deterministic test
    * double for a real media table. */
  def syntheticMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("content"),
      (when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio")
        .otherwise("video")).as("media_type"),
      struct(
        (pmod(col(idCol), lit(1920)) + 1).cast("int").as("width"),
        (pmod(col(idCol), lit(1080)) + 1).cast("int").as("height"),
        (octet_length(col(textCol)) * 100).cast("long").as("duration_ms"),
        lit("stub").as("codec"),
      ).as("meta"))

  /** Feature row produced by the decode/extract stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("byte_len", IntegerType),
    StructField("features", ArrayType(FloatType)),
  ))

  /** STUB decode: a real implementation would decode the codec and
    * produce pixel/sample tensors. This deterministic fake produces a
    * 16-bin byte histogram normalised to [0,1] — enough to exercise the
    * full distributed plumbing (batching, schema, downstream ANN).
    */
  def fakeDecode(content: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    if (content != null) {
      var i = 0
      while (i < content.length) {
        bins((content(i) & 0xFF) >> 4) += 1f
        i += 1
      }
      val n = math.max(content.length, 1).toFloat
      var j = 0
      while (j < 16) { bins(j) /= n; j += 1 }
    }
    bins
  }

  /** Per-partition batched feature extraction — the Scala analogue of a
    * pandas `mapInPandas` UDF: one decoder instance per partition,
    * rows streamed through it lazily (no per-row setup cost, bounded
    * memory). `decodeFn` defaults to the stub.
    */
  /** Typed feature row — keeps extraction in the Dataset lane. */
  case class MediaFeatures(media_id: Long, byte_len: Int, features: Seq[Float])

  def extractFeatures(
      media: DataFrame,
      decodeFn: Array[Byte] => Array[Float] = fakeDecode): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    // Dataset.mapPartitions with encoders (not df.rdd + createDataFrame):
    // rows stay in Tungsten format at the boundary, and the partition
    // iterator gives the one-decoder-per-partition shape a real codec
    // needs. Narrow — no shuffle.
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder setup happens here (stub needs none)
        rows.map { case (id, content) =>
          MediaFeatures(id,
            if (content == null) 0 else content.length,
            decodeFn(content).toSeq)
        }
      }
      .toDF()
  }

  /** STUB resize: a real implementation decodes, rescales pixels and
    * re-encodes. The deterministic fake rewrites the metadata to the
    * target geometry and truncates/extends the payload proportionally —
    * enough to exercise the plumbing (schema stability, narrow pass,
    * metadata consistency) that a javacv-backed decoder would slot
    * into. Image-typed rows only; other media pass through unchanged.
    */
  def resizeImages(media: DataFrame, width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0, "resizeImages: target must be positive")
    val isImage = col("media_type") === "image"
    media
      .withColumn("content",
        when(isImage,
          // proportional payload truncation stands in for re-encoding
          expr(s"substring(content, 1, greatest(int(octet_length(content) * " +
            s"least($width * $height / greatest(meta.width * meta.height, 1), 1.0)), 1))"))
          .otherwise(col("content")))
      .withColumn("meta",
        when(isImage,
          struct(lit(width).as("width"), lit(height).as("height"),
            col("meta.duration_ms").as("duration_ms"),
            col("meta.codec").as("codec")))
          .otherwise(col("meta")))
  }

  /** Deterministic frame sampling for video-typed rows: pick every
    * `stride`-th byte offset as a fake "frame" marker — placeholder for
    * real keyframe extraction, exercising the explode/fan-out shape a
    * frame sampler produces. */
  def sampleFrames(media: DataFrame, stride: Int = 1024): DataFrame =
    media
      .filter(col("media_type") === "video")
      .select(col("media_id"),
        // integer division keeps both sequence() bounds LongType —
        // fractional bounds are a DATATYPE_MISMATCH analysis error
        explode(sequence(lit(0L),
          floor(octet_length(col("content")).cast("long") / stride).cast("long")))
          .as("frame_idx"))
}
