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

  test("resizeImages rewrites image metadata, leaves other media untouched") {
    val m = Multimodal.syntheticMediaTable(docs, "doc_id", "text")
    val out = Multimodal.resizeImages(m, 64, 48)
    assert(out.schema == m.schema) // plumbing: schema stable
    val img = out.filter($"media_id" === 0).select("meta.width", "meta.height").head()
    assert(img.getInt(0) == 64 && img.getInt(1) == 48)
    val audio = out.filter($"media_id" === 1).select("meta.width").head()
    assert(audio.getInt(0) == 2) // doc_id 1 % 1920 + 1, unchanged
    val audioContent = out.filter($"media_id" === 1).select("content").head()
    assert(new String(audioContent.getAs[Array[Byte]](0), "UTF-8") == "audio doc one")
    assertThrows[IllegalArgumentException](Multimodal.resizeImages(m, 0, 10))
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
