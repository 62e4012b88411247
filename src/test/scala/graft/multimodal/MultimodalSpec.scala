package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = df("doc_id BIGINT, text STRING",
    Seq(0L, "image doc zero"), Seq(1L, "audio doc one"),
    Seq(2L, "video doc two with more bytes inside"), Seq(5L, "video doc five"))

  test("syntheticMediaTable produces the canonical multimodal layout") {
    val m = Multimodal.syntheticMediaTable(docs, "doc_id", "text")
    assert(m.columns.toSeq == Seq("media_id", "content", "media_type", "meta"))
    val types = m.select("media_id", "media_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(types == Map(0L -> "image", 1L -> "audio", 2L -> "video", 5L -> "video"))
    val meta = m.filter($"media_id" === 2).select("meta.width", "meta.height").head()
    assert(meta.getInt(0) == 3 && meta.getInt(1) == 3)
  }

  test("fakeDecode: 16-bin normalised byte histogram; null-safe") {
    val h = Multimodal.fakeDecode("aaaa".getBytes("UTF-8"))
    assert(h.length == 16)
    assert(math.abs(h.sum - 1.0f) < 1e-6) // all mass in one pass
    assert(h(('a' & 0xFF) >> 4) == 1.0f)
    assert(Multimodal.fakeDecode(null).forall(_ == 0f))
  }

  test("extractFeatures runs per-partition and matches fakeDecode") {
    val m = Multimodal.syntheticMediaTable(docs, "doc_id", "text")
    val f = Multimodal.extractFeatures(m)
    assert(f.columns.toSeq == Seq("media_id", "byte_len", "features"))
    val row = f.filter($"media_id" === 0).head()
    assert(row.getInt(1) == "image doc zero".getBytes("UTF-8").length)
    val expected = Multimodal.fakeDecode("image doc zero".getBytes("UTF-8")).toSeq
    assert(row.getSeq[Float](2) == expected)
  }

  test("encodeSolidPng → decodeImage round-trips geometry and pixels") {
    val bytes = Multimodal.encodeSolidPng(10, 6, 200, 50, 7)
    val img = Multimodal.decodeImage(bytes).get
    assert(img.getWidth == 10 && img.getHeight == 6)
    val p = img.getRGB(9, 5)
    assert(((p >> 16) & 0xFF) == 200 && ((p >> 8) & 0xFF) == 50 && (p & 0xFF) == 7)
    assert(Multimodal.decodeImage(null).isEmpty)
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("imageFeatures: real decoded width/height/channel means") {
    val bytes = Multimodal.encodeSolidPng(8, 4, 120, 60, 30)
    val f = Multimodal.imageFeatures(Multimodal.decodeImage(bytes).get)
    assert(f.toSeq == Seq(8f, 4f, 120f, 60f, 30f, 70f)) // (120+60+30)/3
  }

  test("syntheticImageTable generates decodable PNGs with id-derived stats") {
    val m = Multimodal.syntheticImageTable(docs, "doc_id")
    assert(m.columns.toSeq == Seq("media_id", "content", "media_type", "meta"))
    val row = m.filter($"media_id" === 5).select("content", "meta.width", "meta.height").head()
    val img = Multimodal.decodeImage(row.getAs[Array[Byte]](0)).get
    assert(img.getWidth == 7 && img.getHeight == 7)    // 5%29+2, 5%13+2
    assert(row.getInt(1) == 7 && row.getInt(2) == 7)
    val p = img.getRGB(0, 0)
    assert(((p >> 16) & 0xFF) == 35 && ((p >> 8) & 0xFF) == 65 && (p & 0xFF) == 145)
  }

  test("extractFeatures decodes real images via ImageIO (6-d stats vector)") {
    val m = Multimodal.syntheticImageTable(docs, "doc_id")
    val f = Multimodal.extractFeatures(m)
    val row = f.filter($"media_id" === 2).head()
    // id 2: w=4, h=4, rgb=(14,26,58), luma=(14+26+58)/3
    assert(row.getSeq[Float](2) == Seq(4f, 4f, 14f, 26f, 58f, 98f / 3.0f))
  }

  test("resizeImages really rescales decodable images, passes others through") {
    val m = Multimodal.syntheticImageTable(docs, "doc_id")
    val out = Multimodal.resizeImages(m, 4, 3)
    assert(out.schema == m.schema) // plumbing: schema stable
    val row = out.filter($"media_id" === 5).select("content", "meta.width", "meta.height").head()
    val img = Multimodal.decodeImage(row.getAs[Array[Byte]](0)).get
    assert(img.getWidth == 4 && img.getHeight == 3)
    assert(row.getInt(1) == 4 && row.getInt(2) == 3)
    val p = img.getRGB(2, 1) // solid colour survives bilinear rescale exactly
    assert(((p >> 16) & 0xFF) == 35 && ((p >> 8) & 0xFF) == 65 && (p & 0xFF) == 145)

    // text-byte payloads (undecodable) and non-image media pass through
    val fake = Multimodal.syntheticMediaTable(docs, "doc_id", "text")
    val out2 = Multimodal.resizeImages(fake, 64, 48)
    val img0 = out2.filter($"media_id" === 0).select("content", "meta.width").head()
    assert(new String(img0.getAs[Array[Byte]](0), "UTF-8") == "image doc zero")
    assert(img0.getInt(1) == 1) // 0 % 1920 + 1, unchanged: payload not an image
    val audioContent = out2.filter($"media_id" === 1).select("content").head()
    assert(new String(audioContent.getAs[Array[Byte]](0), "UTF-8") == "audio doc one")
    assertThrows[IllegalArgumentException](Multimodal.resizeImages(m, 0, 10))
  }

  test("dHash: deterministic, brightness-invariant, copy-detecting") {
    def patterned(seed: Long, shift: Int = 0): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(36, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (cy <- 0 until 8; cx <- 0 until 9) {
        val v0 = math.floorMod(seed * 2654435761L + cx * 97L + cy * 31L, 200L).toInt
        val v = math.min(v0 + shift, 255)
        for (dy <- 0 until 4; dx <- 0 until 4)
          img.setRGB(cx * 4 + dx, cy * 4 + dy, (v << 16) | (v << 8) | v)
      }
      img
    }
    val h1 = Multimodal.dHash(patterned(7))
    assert(h1 == Multimodal.dHash(patterned(7)), "dHash must be deterministic")
    // global brightness shift preserves adjacent-pixel order → same hash
    assert(h1 == Multimodal.dHash(patterned(7, shift = 20)))
    // a different pattern must differ
    assert(h1 != Multimodal.dHash(patterned(8)))
    // encode → decode round-trip preserves the hash (PNG is lossless)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(patterned(7), "png", bos)
      bos.toByteArray
    }
    assert(Multimodal.dHash(Multimodal.decodeImage(bytes).get) == h1)
  }

  test("imageNearDuplicates: planted copies found via banded pairing, no all-pairs") {
    val ids = (0L until 40L).map(Tuple1(_)).toDF("doc_id")
    val base = Multimodal.syntheticPatternTable(ids, "doc_id")
    // plant exact copies of ids 0-4 at +1000
    val dups = base.filter($"media_id" < 5)
      .withColumn("media_id", $"media_id" + 1000L)
    val pairs = Multimodal.imageNearDuplicates(base.unionByName(dups), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val planted = pairs.filter { case (a, b, h) => b - a == 1000L && h == 0 }
    assert(planted.length == 5, s"expected 5 planted pairs, got ${pairs.toSeq}")
    // undecodable payloads are dropped, not failed
    val withJunk = base.unionByName(
      Multimodal.syntheticMediaTable(docs, "doc_id", "text"))
    assert(Multimodal.imageDHashes(withJunk).count() == 40)
  }

  test("encodeWavPcm16 → decodeAudio round-trips frames, rate and RMS") {
    val samples = Array.tabulate(1600)(i => if ((i / 4) % 2 == 0) 3000 else -3000)
      .map(_.toShort)
    val wav = Multimodal.encodeWavPcm16(8000, samples)
    val a = Multimodal.decodeAudio(wav).get
    assert(a.sample_rate == 8000 && a.channels == 1)
    assert(a.n_frames == 1600L)
    assert(a.duration_ms == 200.0)
    assert(a.rms == 3000.0) // ±A square wave: RMS exactly A
    assert(Multimodal.decodeAudio(null).isEmpty)
    assert(Multimodal.decodeAudio("definitely not audio bytes at all".getBytes).isEmpty)
    // an image payload is not audio either
    assert(Multimodal.decodeAudio(Multimodal.encodeSolidPng(8, 8, 1, 2, 3)).isEmpty)
  }

  test("syntheticAudioTable + extractAudioFeatures: closed-form stats per id") {
    val m = Multimodal.syntheticAudioTable(docs, "doc_id")
    val f = Multimodal.extractAudioFeatures(m)
    val r = f.filter($"media_id" === 5).head()
    // id 5: n = 805, amp = 6000
    assert(r.getAs[Long]("n_frames") == 805L)
    assert(r.getAs[Double]("duration_ms") == 805 * 1000.0 / 8000)
    assert(r.getAs[Double]("rms") == 6000.0)
    assert(r.getAs[Int]("sample_rate") == 8000 && r.getAs[Int]("channels") == 1)
    // undecodable payloads are dropped, not failed
    val junk = Multimodal.syntheticMediaTable(docs, "doc_id", "text")
    assert(Multimodal.extractAudioFeatures(junk).count() == 0)
  }

  test("audioDHash: deterministic, volume-invariant, length-tolerant, junk-dropping") {
    def wavFromEnvelope(env: Array[Short], perWindow: Int): Array[Byte] = {
      val samples = new Array[Short](env.length * perWindow)
      env.indices.foreach { w =>
        (0 until perWindow).foreach { i =>
          samples(w * perWindow + i) =
            if ((i / 4) % 2 == 0) env(w) else (-env(w)).toShort
        }
      }
      Multimodal.encodeWavPcm16(8000, samples)
    }
    val rnd = new scala.util.Random(41)
    val env = Array.fill(65)((100 + rnd.nextInt(900)).toShort)
    val h1 = Multimodal.audioDHash(wavFromEnvelope(env, 100))
    assert(h1.isDefined)
    assert(h1 == Multimodal.audioDHash(wavFromEnvelope(env, 100)))
    // uniform gain: every window's energy scales alike → same hash
    val doubled = env.map(a => (a * 2).toShort)
    assert(h1 == Multimodal.audioDHash(wavFromEnvelope(doubled, 100)))
    // same envelope at twice the length per window → same hash
    assert(h1 == Multimodal.audioDHash(wavFromEnvelope(env, 200)))
    // constant amplitude: no energy structure → all-zero fingerprint
    val flat = Array.fill[Short](65)(1000)
    assert(Multimodal.audioDHash(wavFromEnvelope(flat, 100)).contains(0L))
    // junk and short payloads have no audio identity
    assert(Multimodal.audioDHash("not audio".getBytes).isEmpty)
    assert(Multimodal.audioDHash(null).isEmpty)
    assert(Multimodal.audioDHash(
      Multimodal.encodeWavPcm16(8000, Array.fill[Short](10)(5))).isEmpty)
  }

  test("audioNearDuplicates: planted copies pair at hamming 0, distinct patterns don't") {
    val ids = (0L until 60L).toDF("id")
    val base = Multimodal.syntheticAudioPatternTable(ids, "id")
    val dups = base.filter($"media_id" < 10)
      .withColumn("media_id", $"media_id" + 1000L)
    val pairs = Multimodal.audioNearDuplicates(base.unionByName(dups), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.length == 10)
    assert(pairs.forall { case (a, b, h) => b - a == 1000L && h == 0 })
  }

  test("snapToAspectBuckets: exact integer argmin, first-listed wins rational ties") {
    val dims = Seq(
      (1L, 16, 9),   // exact 16:9
      (2L, 100, 100),// exact 1:1
      (3L, 2, 1),    // between 16:9 (1.78) and 1:1 — closer to 16:9 in log space
      (4L, 2, 3),    // portrait, nearest 3:4? 0.667 vs 0.75 (3:4) / 0.5625 (9:16)
      (5L, 30, 14))  // 2.14 → 16:9
      .toDF("media_id", "width", "height")
    val out = Multimodal.snapToAspectBuckets(dims, "width", "height",
      Seq((1, 1), (4, 3), (3, 4), (16, 9), (9, 16)))
      .collect().map(r => r.getLong(0) -> (r.getAs[Int]("bucket_w"),
        r.getAs[Int]("bucket_h"))).toMap
    assert(out(1L) == ((16, 9)) && out(2L) == ((1, 1)) && out(5L) == ((16, 9)))
    // 2:1 vs 16:9: ratio 2 → dist to 16/9 = 9/8; to 1/1 = 2 → 16:9
    assert(out(3L) == ((16, 9)))
    // 2:3 = 0.667: dist to 3/4 = max(8,9)/min(8,9) = 9/8; to 9/16 = 32/27;
    // to 1/1 = 3/2 → 3:4 wins
    assert(out(4L) == ((3, 4)))
    // exact rational tie: 1:2 against buckets (1,1) and (1,4) — both at
    // ratio factor 2 — keeps the FIRST listed
    val tie = Seq((9L, 10, 20)).toDF("media_id", "width", "height")
    val t1 = Multimodal.snapToAspectBuckets(tie, "width", "height",
      Seq((1, 1), (1, 4))).head()
    assert((t1.getAs[Int]("bucket_w"), t1.getAs[Int]("bucket_h")) == ((1, 1)))
    val t2 = Multimodal.snapToAspectBuckets(tie, "width", "height",
      Seq((1, 4), (1, 1))).head()
    assert((t2.getAs[Int]("bucket_w"), t2.getAs[Int]("bucket_h")) == ((1, 4)))
  }

  test("assignAspectBuckets decodes real geometry and drops junk; batches count") {
    val spark2 = spark
    import spark2.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, Multimodal.encodeSolidPng(32, 18, 1, 2, 3),
        "image", Multimodal.MediaMeta(32, 18, None, "png")),
      Multimodal.MediaRow(2L, Multimodal.encodeSolidPng(10, 10, 1, 2, 3),
        "image", Multimodal.MediaMeta(10, 10, None, "png")),
      Multimodal.MediaRow(3L, "junk".getBytes, "image",
        Multimodal.MediaMeta(0, 0, None, "?"))).toDF()
    val assigned = Multimodal.assignAspectBuckets(
      media, Seq((1, 1), (16, 9)))
    val rows = assigned.collect()
      .map(r => r.getLong(0) -> (r.getAs[Int]("width"), r.getAs[Int]("height"),
        r.getAs[Int]("bucket_w"), r.getAs[Int]("bucket_h"))).toMap
    assert(rows.keySet == Set(1L, 2L)) // junk dropped
    assert(rows(1L) == ((32, 18, 16, 9)) && rows(2L) == ((10, 10, 1, 1)))
    val batches = Multimodal.aspectBucketBatches(assigned, batchSize = 2)
      .collect().map(r => (r.getAs[Int]("bucket_w"), r.getAs[Int]("bucket_h"),
        r.getAs[Long]("n_images"), r.getAs[Long]("n_batches"),
        r.getAs[Long]("n_leftover"))).toSet
    assert(batches == Set((16, 9, 1L, 0L, 1L), (1, 1, 1L, 0L, 1L)))
  }

  test("vadSegmentsOf finds runs, merges gaps, drops blips") {
    // 10 frames of 4 samples: frames 1-2 loud, 4 loud, 7-9 loud
    def frame(amp: Short) = Array.fill[Short](4)(amp)
    val s = (frame(0) ++ frame(2000) ++ frame(2000) ++ frame(0) ++
      frame(2000) ++ frame(0) ++ frame(0) ++ frame(2000) ++
      frame(2000) ++ frame(2000)).toArray
    assert(Multimodal.vadSegmentsOf(s, 4, 100.0, 0, 1) ==
      Seq((1, 2), (4, 1), (7, 3)))
    // gap 1 merges frames 1-4 (span includes the bridged silence)
    assert(Multimodal.vadSegmentsOf(s, 4, 100.0, 1, 1) ==
      Seq((1, 4), (7, 3)))
    // minSegFrames 2 drops the single-frame blip
    assert(Multimodal.vadSegmentsOf(s, 4, 100.0, 0, 2) ==
      Seq((1, 2), (7, 3)))
    // gap 2 merges everything into one span
    assert(Multimodal.vadSegmentsOf(s, 4, 100.0, 2, 1) == Seq((1, 9)))
  }

  test("vadSegments recovers the speech fixture's closed-form bursts") {
    val spark2 = spark
    import spark2.implicits._
    val ids = Seq(0L, 1L, 2L, 5L).toDF("doc_id")
    val media = Multimodal.syntheticSpeechTable(ids, "doc_id")
    val segs = Multimodal.vadSegments(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(x => (x._1, x._2))
    def expected(id: Long) = {
      val lead = 2 + (id % 3)
      val k = (1 + id % 3).toInt
      var f = lead
      (0 until k).map { j =>
        val a = 4 + ((id + 3 * j) % 5)
        val row = (id, j.toLong, f * 10, (f + a) * 10, a)
        f += a + 3
        row
      }
    }
    assert(segs.toSeq == Seq(0L, 1L, 2L, 5L).flatMap(expected))
    // profile agrees with the segment table per id
    val prof = Multimodal.vadProfile(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    Seq(0L, 1L, 2L, 5L).foreach { id =>
      val e = expected(id)
      val total = 2 + (id % 3) + e.map(_._5 + 3).sum
      assert(prof(id) == ((e.length.toLong, e.map(_._5).sum, total)))
    }
  }

  test("vadProfile keeps all-silence rows with zero segments") {
    val spark2 = spark
    import spark2.implicits._
    val silent = Seq(Multimodal.MediaRow(7L,
      Multimodal.encodeWavPcm16(8000, new Array[Short](800)), "audio",
      Multimodal.MediaMeta(0, 0, Some(100L), "wav"))).toDF()
    val p = Multimodal.vadProfile(silent).head()
    assert((p.getLong(1), p.getLong(2), p.getLong(3)) == ((0L, 0L, 10L)))
    assert(Multimodal.vadSegments(silent).count() == 0L)
  }

  test("sampleFrames emits floor(bytes/stride)+1 frames for video rows only") {
    val m = Multimodal.syntheticMediaTable(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(m, stride = 10)
    val byId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val len2 = "video doc two with more bytes inside".getBytes("UTF-8").length
    val len5 = "video doc five".getBytes("UTF-8").length
    assert(byId == Map(2L -> (len2 / 10 + 1).toLong, 5L -> (len5 / 10 + 1).toLong))
  }
}
