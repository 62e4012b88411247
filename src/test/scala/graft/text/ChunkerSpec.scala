package graft.text

import graft.SparkTestBase

class ChunkerSpec extends SparkTestBase {
  import spark.implicits._

  test("chunkDocuments windows with overlap and covers every token") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = Chunker.chunkDocuments(docs, "doc_id", "text", chunkTokens = 4, overlapTokens = 1)
      .orderBy("chunk_id").collect()
    // stride 3, start bound 10−1=9: starts 1,4,7 — a start at 10 would
    // emit "t10", a strict suffix of the previous chunk (duplicate text)
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    assert(out.map(_.getLong(2)).toSeq == Seq(4L, 4L, 4L))
    assert(out.head.getString(3) == "t1 t2 t3 t4")
    assert(out(1).getString(3) == "t4 t5 t6 t7")
    assert(out.last.getString(3) == "t7 t8 t9 t10")
  }

  test("chunkDocuments never emits a chunk that is a suffix of its predecessor") {
    // doc lengths chosen to land starts at every position mod stride
    val docs = (5 to 40).map(n => (n.toLong, (1 to n).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Chunker.chunkDocuments(docs, "doc_id", "text", chunkTokens = 8, overlapTokens = 3)
      .orderBy("doc_id", "chunk_id").collect()
    out.groupBy(_.getLong(0)).foreach { case (_, chunks) =>
      chunks.sortBy(_.getLong(1)).sliding(2).foreach {
        case Array(a, b) =>
          assert(!(a.getString(3) endsWith b.getString(3)),
            s"chunk '${b.getString(3)}' duplicates the tail of '${a.getString(3)}'")
        case _ =>
      }
      // every token still covered: last chunk ends at the doc's last token
      assert(chunks.last.getString(3).split(" ").last == s"x${chunks.head.getLong(0)}")
    }
  }

  test("chunkDocuments: short docs emit one chunk, empty docs none") {
    val docs = Seq((1L, "just three tokens"), (2L, "   ")).toDF("doc_id", "text")
    val out = Chunker.chunkDocuments(docs, "doc_id", "text", chunkTokens = 16, overlapTokens = 4)
    val rows = out.collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 1L && rows.head.getLong(2) == 3L)
  }

  test("chunkDocuments: zero overlap partitions tokens exactly") {
    val docs = Seq((1L, (1 to 9).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = Chunker.chunkDocuments(docs, "doc_id", "text", chunkTokens = 3, overlapTokens = 0)
    assert(out.count() == 3)
    assert(out.agg(org.apache.spark.sql.functions.sum("n_tokens")).head().getLong(0) == 9L)
  }

  test("chunkDocuments validates parameters") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunker.chunkDocuments(docs, "doc_id", "text", chunkTokens = 4, overlapTokens = 4)
    }
    intercept[IllegalArgumentException] {
      Chunker.chunkDocuments(docs, "doc_id", "text", chunkTokens = 0)
    }
  }

  test("sentences: terminator-inclusive runs, trailing fragment, empties out") {
    import spark.implicits._
    val got = Seq("One two. Three four! Five", "", "No terminator here")
      .toDF("t").select(Chunker.sentences($"t")).as[Seq[String]].collect()
    assert(got(0) == Seq("One two.", "Three four!", "Five"))
    assert(got(1) == Seq())
    assert(got(2) == Seq("No terminator here"))
  }

  test("chunkBySentences groups consecutive sentences by token budget") {
    import spark.implicits._
    // sentences of 3/3/3/5 tokens; maxTokens=6: offsets 0,3,6,9 ->
    // chunks 0,0,1,1
    val df = Seq((1L, "a b c. d e f. g h i. j k l m n.")).toDF("doc_id", "text")
    val got = Chunker.chunkBySentences(df, "doc_id", "text", maxTokens = 6)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq == Seq(
      (0L, 2L, 6L, "a b c. d e f."),
      (1L, 2L, 8L, "g h i. j k l m n.")))
  }

  test("chunkBySentences: oversize sentence stays whole; chunk ids contiguous per doc") {
    import spark.implicits._
    val df = Seq((1L, "w1 w2 w3 w4 w5 w6 w7 w8. a b.")).toDF("doc_id", "text")
    val got = Chunker.chunkBySentences(df, "doc_id", "text", maxTokens = 4)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getString(4)))
    // 8-token sentence overflows its chunk but is not split; next
    // sentence starts at offset 8 -> chunk 2
    assert(got.toSeq == Seq((0L, "w1 w2 w3 w4 w5 w6 w7 w8."), (2L, "a b.")))
  }
}
