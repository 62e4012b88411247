package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Media payloads are opaque `binary` columns carried next to typed
  * metadata — the same physical layout the big multimodal training
  * corpora use in parquet. The image path is REAL: `decodeImage` /
  * `imageFeatures` / `resizeImages` / `dHash` decode, analyse, rescale
  * and perceptually fingerprint actual PNG/JPEG/BMP/GIF bytes through
  * the JDK's `javax.imageio.ImageIO` (no external codec dependency).
  * The audio path is REAL for the JDK's PCM container codecs:
  * `decodeAudio` parses WAV/AIFF/AU through `javax.sound.sampled`
  * (rate/channels/frames/duration/RMS). Payloads with no JDK codec
  * (MP3/OGG, video, arbitrary blobs) fall back to a deterministic
  * byte-histogram feature so the distributed plumbing is exercised
  * end-to-end for every media type.
  *
  * Scale notes: feature extraction and resize are `mapPartitions`
  * (narrow, no shuffle) with one decoder context per partition;
  * binary-heavy tables should be read with a smaller
  * `spark.sql.files.maxPartitionBytes` so one task's batch of blobs
  * fits in executor memory. `ImageIO.setUseCache(false)` keeps decode
  * purely in-memory (no executor-local tmp files).
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

  /** Typed rows for the generated-image table. */
  case class MediaMeta(width: Int, height: Int, duration_ms: Option[Long], codec: String)
  case class MediaRow(media_id: Long, content: Array[Byte], media_type: String, meta: MediaMeta)

  /** Encode a solid-colour RGB PNG entirely in the JDK — the
    * deterministic image fixture generator (executors each encode their
    * own partition's rows; nothing is collected). */
  def encodeSolidPng(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    require(width > 0 && height > 0, "encodeSolidPng: dimensions must be positive")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val rgb = ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    encodePng(img)
  }

  private def encodePng(img: BufferedImage): Array[Byte] = {
    ImageIO.setUseCache(false)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Generate a media table of REAL PNG payloads, one per input row, with
    * id-derived geometry and fill colour (so downstream decode results are
    * closed-form functions of the id — oracle-checkable without an image
    * library on the oracle side):
    * width = id%29+2, height = id%13+2, rgb = (id*7, id*13, id*29) % 256.
    */
  def syntheticImageTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (math.floorMod(id, 29L) + 2L).toInt
          val h = (math.floorMod(id, 13L) + 2L).toInt
          val r = math.floorMod(id * 7L, 256L).toInt
          val g = math.floorMod(id * 13L, 256L).toInt
          val b = math.floorMod(id * 29L, 256L).toInt
          MediaRow(id, encodeSolidPng(w, h, r, g, b), "image",
            MediaMeta(w, h, None, "png"))
        }
      }
      .toDF()
  }

  /** Patterned-PNG fixture: a 36×32 image holding a 9×8 grid of
    * id-seeded brightness cells (4×4 px each), so the perceptual hash
    * of each image is a DIVERSE deterministic function of the id —
    * the solid-colour fixture's dHash is degenerate (all images hash
    * to the same value because no adjacent-pixel comparison ever
    * differs). Cell brightness is a murmur-style MIX of (id, cx, cy) —
    * a linear formula makes every adjacent-cell difference a constant,
    * which correlates the hashes across ids (measured: 1,675 false
    * pairs at radius 3 over 200 images before the mix). */
  def syntheticPatternTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val img = new BufferedImage(36, 32, BufferedImage.TYPE_INT_RGB)
          var cy = 0
          while (cy < 8) {
            var cx = 0
            while (cx < 9) {
              var h = id * 0x9E3779B97F4A7C15L + cx * 0xC2B2AE3D27D4EB4FL +
                cy * 0x165667B19E3779F9L
              h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
              val v = math.floorMod(h, 251L).toInt
              val rgb = (v << 16) | (v << 8) | v
              var dy = 0
              while (dy < 4) {
                var dx = 0
                while (dx < 4) { img.setRGB(cx * 4 + dx, cy * 4 + dy, rgb); dx += 1 }
                dy += 1
              }
              cx += 1
            }
            cy += 1
          }
          MediaRow(id, encodePng(img), "image", MediaMeta(36, 32, None, "png"))
        }
      }
      .toDF()
  }

  /** Decode an image payload via JDK ImageIO (PNG/JPEG/BMP/GIF/TIFF).
    * Returns None for null/undecodable bytes — never throws, so a few
    * corrupt blobs in a 100 TB corpus don't fail the task. */
  def decodeImage(content: Array[Byte]): Option[BufferedImage] =
    if (content == null || content.length < 8) None
    else
      try {
        ImageIO.setUseCache(false)
        Option(ImageIO.read(new ByteArrayInputStream(content)))
      } catch { case _: Exception => None }

  /** Real image feature vector from decoded pixels:
    * [width, height, meanR, meanG, meanB, meanLuma]. Channel means are
    * computed in integer/double space (exact for 8-bit channels). */
  def imageFeatures(img: BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xFF
        sg += (p >> 8) & 0xFF
        sb += p & 0xFF
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    Array(w.toFloat, h.toFloat,
      (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
      ((sr + sg + sb) / (3.0 * n)).toFloat)
  }

  /** Fallback feature for payloads with no JDK codec (audio/video/blob):
    * a 16-bin byte histogram normalised to [0,1] — deterministic and
    * cheap, keeping every media type flowing through one pipeline. */
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

  /** Default decoder: real ImageIO decode when the bytes are an image the
    * JDK can read; byte-histogram fallback otherwise. */
  def decodeContent(content: Array[Byte]): Array[Float] =
    decodeImage(content).map(imageFeatures).getOrElse(fakeDecode(content))

  /** Feature row produced by the decode/extract stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("byte_len", IntegerType),
    StructField("features", ArrayType(FloatType)),
  ))

  /** Typed feature row — keeps extraction in the Dataset lane. */
  case class MediaFeatures(media_id: Long, byte_len: Int, features: Seq[Float])

  /** Per-partition batched feature extraction — the Scala analogue of a
    * pandas `mapInPandas` UDF: one decoder instance per partition,
    * rows streamed through it lazily (no per-row setup cost, bounded
    * memory). `decodeFn` defaults to [[decodeContent]] (real ImageIO
    * for images, byte histogram for everything else).
    */
  def extractFeatures(
      media: DataFrame,
      decodeFn: Array[Byte] => Array[Float] = decodeContent): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    // Dataset.mapPartitions with encoders (not df.rdd + createDataFrame):
    // rows stay in Tungsten format at the boundary, and the partition
    // iterator gives the one-decoder-per-partition shape a real codec
    // needs. Narrow — no shuffle.
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder setup happens here (ImageIO is static)
        rows.map { case (id, content) =>
          MediaFeatures(id,
            if (content == null) 0 else content.length,
            decodeFn(content).toSeq)
        }
      }
      .toDF()
  }

  /** Rescale a decoded image to the target geometry (bilinear). */
  def rescale(img: BufferedImage, width: Int, height: Int): BufferedImage = {
    val out = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, width, height, null)
    } finally g.dispose()
    out
  }

  /** REAL resize: image-typed rows whose payload ImageIO can decode are
    * rescaled to (width, height) with bilinear interpolation and
    * re-encoded as PNG, and their `meta.width`/`meta.height` updated;
    * all other rows (non-image media, undecodable payloads) pass through
    * unchanged. Narrow `mapPartitions` — schema-stable, no shuffle; one
    * graphics context per row is required by AWT but all allocation is
    * in-memory (headless-safe — BufferedImage needs no display).
    */
  def resizeImages(media: DataFrame, width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0, "resizeImages: target must be positive")
    val schema = media.schema
    val ci = schema.fieldIndex("content")
    val ti = schema.fieldIndex("media_type")
    val mi = schema.fieldIndex("meta")
    val metaSchema = schema(mi).dataType.asInstanceOf[StructType]
    val wi = metaSchema.fieldIndex("width")
    val hi = metaSchema.fieldIndex("height")
    implicit val enc = Encoders.row(schema)
    media.mapPartitions { rows =>
      rows.map { row =>
        val isImage = !row.isNullAt(ti) && row.getString(ti) == "image"
        val decoded =
          if (isImage) decodeImage(row.getAs[Array[Byte]](ci)) else None
        decoded match {
          case Some(img) =>
            val bytes = encodePng(rescale(img, width, height))
            val vals = row.toSeq.toArray
            vals(ci) = bytes
            val meta = row.getStruct(mi)
            if (meta != null) {
              val mvals = meta.toSeq.toArray
              mvals(wi) = width
              mvals(hi) = height
              vals(mi) = Row.fromSeq(mvals.toIndexedSeq)
            }
            Row.fromSeq(vals.toIndexedSeq)
          case None => row
        }
      }
    }
  }

  /** 64-bit difference hash (dHash) of a decoded image: rescale to a
    * 9×8 grayscale thumbnail (bilinear — the same [[rescale]] kernel
    * as [[resizeImages]]), then bit (y·8 + x) is set iff
    * gray(x+1, y) > gray(x, y). Invariant to global brightness/
    * contrast shifts (only adjacent-pixel ORDER matters) and to
    * resolution (everything is compared on the 9×8 thumbnail) — the
    * standard perceptual fingerprint for image near-dup detection. */
  def dHash(img: BufferedImage): Long = {
    val t = rescale(img, 9, 8)
    def gray(x: Int, y: Int): Int = {
      val p = t.getRGB(x, y)
      ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
    }
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (gray(x + 1, y) > gray(x, y)) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Perceptual fingerprints for image payloads: (`id`, `sim`) rows —
    * the column contract [[graft.dedup.Dedup.simHashPairs]] consumes,
    * so persisted image fingerprints re-pair without re-decoding the
    * corpus. Narrow `mapPartitions` decode; rows whose payload ImageIO
    * cannot decode are DROPPED (they have no perceptual identity —
    * run text/byte dedup on those instead). */
  def imageDHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, content) =>
        decodeImage(content).map(img => (id, dHash(img)))
      })
      .toDF("id", "sim")
  }

  /** Image near-duplicate pairs: dHash fingerprints through the SAME
    * block-combination band index as text SimHash
    * ([[graft.dedup.Dedup.simHashPairs]] — any pair within
    * `maxHamming` shares an untouched block combination, so recall is
    * contractual and NO all-pairs comparison ever runs). One narrow
    * decode pass + the banded (id, band, bucket) exchange — the same
    * scale shape as the text dedup family. Output:
    * (id_a, id_b, hamming). */
  def imageNearDuplicates(
      media: DataFrame,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame =
    graft.dedup.Dedup.simHashPairs(imageDHashes(media), maxHamming, maxBucketSize)

  // ------------------------------------------------------------ audio

  /** Encode a mono 16-bit PCM WAV entirely in the JDK (RIFF header +
    * little-endian samples) — the audio fixture generator. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, "encodeWavPcm16: sampleRate must be positive")
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                  // PCM
      .putShort(1)                  // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)       // byte rate
      .putShort(2)                  // block align
      .putShort(16)                 // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Decoded-audio stats. `rms` is over 16-bit signed mono PCM. */
  case class AudioStats(
      sample_rate: Int, channels: Int, n_frames: Long,
      duration_ms: Double, rms: Double)

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/
    * AU — the PCM container formats the JDK ships codecs for; MP3/OGG
    * have no JDK codec and return None, falling back to the byte-
    * histogram path like any other codec-less payload). Never throws:
    * corrupt blobs in a 100 TB corpus must not fail the task. */
  def decodeAudio(content: Array[Byte]): Option[AudioStats] =
    if (content == null || content.length < 44) None
    else
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(content))
        try {
          val fmt = ais.getFormat
          val frames = ais.getFrameLength
          val durationMs = frames * 1000.0 / fmt.getSampleRate
          // RMS only for the fixture contract's shape (16-bit mono PCM);
          // other shapes report -1 (stats still real)
          val rms =
            if (fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
              fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
              val bytes = ais.readAllBytes()
              val bb = java.nio.ByteBuffer.wrap(bytes).order(
                if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                else java.nio.ByteOrder.LITTLE_ENDIAN)
              var sumSq = 0.0
              var n = 0L
              while (bb.remaining() >= 2) {
                val s = bb.getShort.toDouble
                sumSq += s * s
                n += 1
              }
              if (n == 0) 0.0 else math.sqrt(sumSq / n)
            } else -1.0
          Some(AudioStats(fmt.getSampleRate.toInt, fmt.getChannels, frames,
            durationMs, rms))
        } finally ais.close()
      } catch { case _: Exception => None }

  /** Audio fixture table: mono 8 kHz square-wave WAVs whose decoded
    * stats are closed-form in the id (oracle-checkable without an
    * audio library): n_frames = 800 + id%800, amplitude = 1000·(1 +
    * id%8) — a ±A square wave has RMS exactly A at any length. */
  def syntheticAudioTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = (800L + math.floorMod(id, 800L)).toInt
          val amp = (1000L * (1L + math.floorMod(id, 8L))).toShort
          val samples = Array.tabulate(n)(i =>
            if ((i / 4) % 2 == 0) amp else (-amp).toShort)
          MediaRow(id, encodeWavPcm16(8000, samples), "audio",
            MediaMeta(0, 0, Some(n * 1000L / 8000L), "wav"))
        }
      }
      .toDF()
  }

  /** Decoded 16-bit mono PCM samples, or None for any other shape —
    * the raw-sample reader behind [[audioDHash]]. Never throws. */
  private def pcm16MonoSamples(content: Array[Byte]): Option[Array[Short]] =
    if (content == null || content.length < 44) None
    else
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(content))
        try {
          val fmt = ais.getFormat
          if (fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
            val bytes = ais.readAllBytes()
            val bb = java.nio.ByteBuffer.wrap(bytes).order(
              if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN)
            val out = new Array[Short](bytes.length / 2)
            var i = 0
            while (bb.remaining() >= 2) { out(i) = bb.getShort; i += 1 }
            Some(out)
          } else None
        } finally ais.close()
      } catch { case _: Exception => None }

  /** Time-energy difference hash — the audio analogue of the image
    * [[dHash]]: the decoded 16-bit mono PCM stream is split into 65
    * equal windows, each reduced to its mean energy, and bit b of the
    * fingerprint is `energy(b+1) > energy(b)`. Relative comparisons
    * make it VOLUME-invariant (uniform gain scales every window's
    * energy alike) and the fixed window count makes it length-
    * invariant (resampling/truncation-tolerant to the window grain).
    * None for undecodable / non-PCM16-mono / shorter-than-65-sample
    * payloads — those have no energy identity. */
  def audioDHash(content: Array[Byte]): Option[Long] =
    pcm16MonoSamples(content).filter(_.length >= 65).map { s =>
      val nw = 65
      val energies = new Array[Double](nw)
      var i = 0
      while (i < nw) {
        val from = (i.toLong * s.length / nw).toInt
        val to = ((i + 1).toLong * s.length / nw).toInt
        var sum = 0.0
        var j = from
        while (j < to) { val v = s(j).toDouble; sum += v * v; j += 1 }
        energies(i) = if (to > from) sum / (to - from) else 0.0
        i += 1
      }
      var bits = 0L
      i = 0
      while (i < 64) {
        if (energies(i + 1) > energies(i)) bits |= 1L << i
        i += 1
      }
      bits
    }

  /** Perceptual fingerprints for audio payloads in the same (`id`,
    * `sim`) contract as [[imageDHashes]] — one narrow mapPartitions
    * decode, undecodable rows dropped. */
  def audioDHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, content) =>
        audioDHash(content).map(h => (id, h))
      })
      .toDF("id", "sim")
  }

  /** Audio near-duplicate pairs: time-energy fingerprints through the
    * SAME block-combination band index as text SimHash and image dHash
    * ([[graft.dedup.Dedup.simHashPairs]] — contractual recall, never
    * all-pairs). Output: (id_a, id_b, hamming). */
  def audioNearDuplicates(
      media: DataFrame,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame =
    graft.dedup.Dedup.simHashPairs(audioDHashes(media), maxHamming, maxBucketSize)

  /** Audio fixture with per-window amplitude ENVELOPES (the audio
    * [[syntheticPatternTable]]): 65 windows × 100 samples of square
    * wave whose amplitude per window comes from the same mix-hash
    * scheme, so window energies form a distinct deterministic pattern
    * per id and [[audioDHash]] neighbours differ. */
  def syntheticAudioPatternTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val samples = new Array[Short](65 * 100)
          var w = 0
          while (w < 65) {
            var h = id * 0x9E3779B97F4A7C15L + w * 0xC2B2AE3D27D4EB4FL
            h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
            val amp = (200L + math.floorMod(h, 1800L)).toShort
            var i = 0
            while (i < 100) {
              samples(w * 100 + i) =
                if ((i / 4) % 2 == 0) amp else (-amp).toShort
              i += 1
            }
            w += 1
          }
          MediaRow(id, encodeWavPcm16(8000, samples), "audio",
            MediaMeta(0, 0, Some(6500L * 1000L / 8000L), "wav"))
        }
      }
      .toDF()
  }

  /** Per-partition batched audio feature extraction — same narrow
    * mapPartitions shape as [[extractFeatures]]; undecodable payloads
    * are dropped (no JDK codec → no audio identity). */
  def extractAudioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, content) =>
        decodeAudio(content).map(a =>
          (id, a.sample_rate, a.channels, a.n_frames, a.duration_ms, a.rms))
      })
      .toDF("media_id", "sample_rate", "channels", "n_frames",
        "duration_ms", "rms")
  }

  // ------------------------------------------------------ VAD

  /** Decoded 16-bit mono PCM samples plus their sample rate, or None
    * for any other shape — the reader behind [[vadSegments]], which
    * needs the rate to place segment boundaries in milliseconds. */
  private def pcm16MonoWithRate(
      content: Array[Byte]): Option[(Int, Array[Short])] =
    if (content == null || content.length < 44) None
    else
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(content))
        try {
          val fmt = ais.getFormat
          if (fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
            val bytes = ais.readAllBytes()
            val bb = java.nio.ByteBuffer.wrap(bytes).order(
              if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN)
            val out = new Array[Short](bytes.length / 2)
            var i = 0
            while (bb.remaining() >= 2) { out(i) = bb.getShort; i += 1 }
            Some((fmt.getSampleRate.toInt, out))
          } else None
        } finally ais.close()
      } catch { case _: Exception => None }

  /** Energy-based voice-activity segmentation of one PCM stream:
    * frames of `frameSamples` samples (a trailing partial frame is
    * dropped) are active when their RMS exceeds `rmsThreshold`; runs
    * of active frames separated by at most `mergeGapFrames` silent
    * frames merge into one segment (the merged span INCLUDES the
    * bridged silence, as a speech segmenter's padding would); segments
    * shorter than `minSegFrames` frames are discarded as blips.
    * Returns (startFrame, nFrames) per segment, in stream order. */
  def vadSegmentsOf(
      samples: Array[Short],
      frameSamples: Int,
      rmsThreshold: Double,
      mergeGapFrames: Int,
      minSegFrames: Int): Seq[(Int, Int)] = {
    require(frameSamples > 0, "vadSegmentsOf: frameSamples must be positive")
    val nFrames = samples.length / frameSamples
    val thresholdEnergy = rmsThreshold * rmsThreshold
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var runStart = -1
    var f = 0
    while (f < nFrames) {
      var sum = 0.0
      var i = f * frameSamples
      val end = i + frameSamples
      while (i < end) { val v = samples(i).toDouble; sum += v * v; i += 1 }
      val active = sum / frameSamples > thresholdEnergy
      if (active && runStart < 0) runStart = f
      if (!active && runStart >= 0) { runs += ((runStart, f - runStart)); runStart = -1 }
      f += 1
    }
    if (runStart >= 0) runs += ((runStart, nFrames - runStart))
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    runs.foreach { case (s, n) =>
      merged.lastOption match {
        case Some((ps, pn)) if s - (ps + pn) <= mergeGapFrames =>
          merged(merged.length - 1) = (ps, s + n - ps)
        case _ => merged += ((s, n))
      }
    }
    merged.filter(_._2 >= minSegFrames).toSeq
  }

  /** Voice-activity segments for every decodable payload in `media`:
    * one narrow mapPartitions pass (decode → frame energies → run
    * merge per row, no shuffle — the plan scales linearly in corpus
    * bytes exactly like [[extractAudioFeatures]]). Output one row per
    * segment: (media_id, seg_idx, start_ms, end_ms, n_frames), with
    * millisecond boundaries from the payload's OWN sample rate.
    * Undecodable / non-PCM16-mono rows are dropped. */
  def vadSegments(
      media: DataFrame,
      frameSamples: Int = 80,
      rmsThreshold: Double = 100.0,
      mergeGapFrames: Int = 0,
      minSegFrames: Int = 1): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, content) =>
        pcm16MonoWithRate(content).toSeq.flatMap { case (rate, samples) =>
          vadSegmentsOf(samples, frameSamples, rmsThreshold,
            mergeGapFrames, minSegFrames).zipWithIndex.map {
            case ((startFrame, n), segIdx) =>
              (id, segIdx.toLong,
                startFrame.toLong * frameSamples * 1000L / rate,
                (startFrame + n).toLong * frameSamples * 1000L / rate,
                n.toLong)
          }
        }
      })
      .toDF("media_id", "seg_idx", "start_ms", "end_ms", "n_frames")
  }

  /** Per-payload speech-activity profile — the curation-filter grain
    * of VAD (keep recordings whose speech ratio clears a bar): one row
    * per decodable payload with (media_id, n_segments, speech_frames,
    * total_frames). Same single narrow pass as [[vadSegments]];
    * payloads with NO active frames still emit a row (n_segments = 0),
    * because "all silence" is exactly what the filter must see. */
  def vadProfile(
      media: DataFrame,
      frameSamples: Int = 80,
      rmsThreshold: Double = 100.0,
      mergeGapFrames: Int = 0,
      minSegFrames: Int = 1): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, content) =>
        pcm16MonoWithRate(content).map { case (_, samples) =>
          val segs = vadSegmentsOf(samples, frameSamples, rmsThreshold,
            mergeGapFrames, minSegFrames)
          (id, segs.length.toLong, segs.map(_._2.toLong).sum,
            (samples.length / frameSamples).toLong)
        }
      })
      .toDF("media_id", "n_segments", "speech_frames", "total_frames")
  }

  /** Speech fixture for the VAD oracle: frame-aligned square-wave
    * bursts separated by silence, all geometry closed-form in the id
    * so DuckDB recomputes the exact segment table. Frames are 80
    * samples at 8 kHz (10 ms). Layout: (2 + id%3) leading silent
    * frames, then k = 1 + id%3 bursts where burst j is
    * 4 + ((id + 3j) % 5) active frames at amplitude 1000·(1 + id%8)
    * followed by 3 silent frames. */
  def syntheticSpeechTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val frame = 80
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val lead = (2 + math.floorMod(id, 3L)).toInt
          val k = (1 + math.floorMod(id, 3L)).toInt
          val amp = (1000L * (1L + math.floorMod(id, 8L))).toShort
          val actives = Array.tabulate(k)(j =>
            (4 + math.floorMod(id + 3L * j, 5L)).toInt)
          val totalFrames = lead + actives.map(_ + 3).sum
          val samples = new Array[Short](totalFrames * frame)
          var f = lead
          actives.foreach { a =>
            var i = f * frame
            val end = (f + a) * frame
            while (i < end) {
              samples(i) = if ((i / 4) % 2 == 0) amp else (-amp).toShort
              i += 1
            }
            f += a + 3
          }
          MediaRow(id, encodeWavPcm16(8000, samples), "audio",
            MediaMeta(0, 0, Some(totalFrames * frame * 1000L / 8000L), "wav"))
        }
      }
      .toDF()
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

  /** Snap `(widthCol, heightCol)` to the closest aspect-ratio bucket
    * from `buckets` — the batch-organisation step of aspect-bucketed
    * image training (variable-geometry corpora batch only within a
    * bucket, so tensors share a shape without destructive square
    * cropping). Bucket b minimises `|ln(w/h) − ln(bw/bh)|`, which is
    * EQUIVALENT to minimising `max(w·bh, h·bw) / min(w·bh, h·bw)` — so
    * candidates compare by exact long cross-multiplication and no
    * float log ever enters the decision (libm ulp differences across
    * engines flip near-tie argmins; the integer rule is portable and
    * oracle-checkable). Exact rational ties keep the FIRST listed
    * bucket. A narrow codegen'd when-fold over the bucket ladder — no
    * UDF, no shuffle; requires positive dims and
    * `w·h·bw·bh < 2^63` (any real image/ladder). Appends `bucket_w`,
    * `bucket_h`. */
  def snapToAspectBuckets(
      df: DataFrame,
      widthCol: String,
      heightCol: String,
      buckets: Seq[(Int, Int)]): DataFrame = {
    require(buckets.nonEmpty, "snapToAspectBuckets: need at least one bucket")
    require(buckets.forall(b => b._1 > 0 && b._2 > 0),
      "snapToAspectBuckets: bucket dims must be positive")
    val w = col(widthCol).cast("long")
    val h = col(heightCol).cast("long")
    // candidate distance as an exact rational num/den ≥ 1
    def cand(b: (Int, Int)) = {
      val a = w * b._2 // w·bh
      val c = h * b._1 // h·bw
      struct(greatest(a, c).as("num"), least(a, c).as("den"),
        lit(b._1).as("bw"), lit(b._2).as("bh"))
    }
    val bestCol = buckets.tail.foldLeft(cand(buckets.head)) { (acc, b) =>
      val c = cand(b)
      // strict < keeps the earlier bucket on exact rational ties
      when(c.getField("num") * acc.getField("den") <
        acc.getField("num") * c.getField("den"), c).otherwise(acc)
    }
    df.withColumn("__graft_ab", bestCol)
      .withColumn("bucket_w", col("__graft_ab.bw"))
      .withColumn("bucket_h", col("__graft_ab.bh"))
      .drop("__graft_ab")
  }

  /** [[snapToAspectBuckets]] over REAL decoded geometry: one narrow
    * mapPartitions decode to (media_id, width, height) — undecodable
    * payloads dropped (no pixels, no aspect) — then the integer snap.
    */
  def assignAspectBuckets(
      media: DataFrame,
      buckets: Seq[(Int, Int)]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val dims = media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, content) =>
        decodeImage(content).map(img => (id, img.getWidth, img.getHeight))
      })
      .toDF("media_id", "width", "height")
    snapToAspectBuckets(dims, "width", "height", buckets)
  }

  /** Batch economics per aspect bucket: full batches of `batchSize`
    * and the leftover images a bucket-wise loader drops (or pads).
    * One bucket-cardinality aggregate. */
  def aspectBucketBatches(
      assigned: DataFrame,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1,
      s"aspectBucketBatches: batchSize must be >= 1, got $batchSize")
    assigned.groupBy(col("bucket_w"), col("bucket_h"))
      .agg(count(lit(1)).as("n_images"))
      .withColumn("n_batches", floor(col("n_images") / batchSize).cast("long"))
      .withColumn("n_leftover", (col("n_images") % batchSize).cast("long"))
  }
}
