package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.SubwordMatcher
import org.apache.spark.unsafe.types.UTF8String

class SubwordSpec extends SparkTestBase {
  import spark.implicits._

  private def toks(text: String, vocab: Seq[String]): Seq[String] =
    Seq(text).toDF("t")
      .select(Subword.subwordTokenize($"t", vocab))
      .as[Seq[String]].head()

  test("greedy longest-match: whole word beats prefix decomposition") {
    assert(toks("unable", Seq("un", "unable", "##able")) == Seq("unable"))
    assert(toks("unable", Seq("un", "##able")) == Seq("un", "##able"))
    assert(toks("unable", Seq("u", "un", "##a", "##able", "##ble")) ==
      Seq("un", "##able"))
  }

  test("continuation pieces require ##; missing cursor match yields one unk") {
    // "able" alone cannot continue after "un" — needs "##able"
    assert(toks("unable", Seq("un", "able")) == Seq("[UNK]"))
    assert(toks("xyz abc", Seq("x", "##y", "##z", "a", "##b", "##c")) ==
      Seq("x", "##y", "##z", "a", "##b", "##c"))
    assert(toks("xyq", Seq("x", "##y")) == Seq("[UNK]"))
  }

  test("closed forms: all-words vocab = 1 piece/word; char vocab = len pieces") {
    val docs = Seq("scan the table", "merge sort scan").toDF("t")
    val words = Seq("scan", "the", "table", "merge", "sort")
    val one = docs.select(Subword.subwordCount($"t", words).as("n"))
      .as[Int].collect()
    assert(one.toSeq == Seq(3, 3))
    val chars = Subword.charFallback(words)
    val lens = docs.select(Subword.subwordCount($"t", chars).as("n"))
      .as[Int].collect()
    assert(lens.toSeq == Seq("scanthetable".length, "mergesortscan".length))
  }

  test("tokenize and count agree; empty and null text") {
    val vocab = Seq("ab", "##c", "a", "##b")
    val df = Seq(Some("abc ab a"), Some(""), Some("   "), None).toDF("t")
    val got = df.select(
      Subword.subwordTokenize($"t", vocab).as("p"),
      Subword.subwordCount($"t", vocab).as("n")).collect()
    assert(got(0).getSeq[String](0) == Seq("ab", "##c", "ab", "a"))
    assert(got(0).getInt(1) == 4)
    assert(got(1).getSeq[String](0) == Seq.empty && got(1).getInt(1) == 0)
    assert(got(2).getSeq[String](0) == Seq.empty && got(2).getInt(1) == 0)
    assert(got(3).isNullAt(0) && got(3).isNullAt(1))
  }

  test("buildWordVocab: frequency cut, deterministic ties, minCount") {
    val docs = Seq("b a a", "a b c", "C c").toDF("t") // norm lowercases
    val v = Subword.buildWordVocab(docs, "t", maxWords = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // counts: a=3, b=2, c=3 → top-2 with tie (a,c) by word asc → a, c
    assert(v == Seq(("a", 3L), ("c", 3L)))
    val v2 = Subword.buildWordVocab(docs, "t", maxWords = 10, minCount = 3L)
      .collect().map(_.getString(0)).toSeq
    assert(v2 == Seq("a", "c"))
  }

  test("kernel agrees with an independent greedy reference on random input") {
    def refTokenize(text: String, vocab: Set[String], unk: String): Seq[String] = {
      def word(w: String): Seq[String] = {
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var pos = 0
        var first = true
        while (pos < w.length) {
          val cands = (w.length - pos).to(1, -1).iterator
            .map(l => (if (first) "" else "##") + w.substring(pos, pos + l))
            .find(vocab.contains)
          cands match {
            case None => return Seq(unk)
            case Some(p) =>
              out += p
              pos += (if (first) p.length else p.length - 2)
              first = false
          }
        }
        out.toSeq
      }
      text.trim match {
        case "" => Seq.empty
        case t => t.split("\\s+").toSeq.flatMap(word)
      }
    }
    val rnd = new scala.util.Random(29)
    val alphabet = "abcd"
    (1 to 100).foreach { _ =>
      val vocab = (1 to (2 + rnd.nextInt(10))).map { _ =>
        val l = 1 + rnd.nextInt(3)
        val core = Array.fill(l)(alphabet(rnd.nextInt(4))).mkString
        if (rnd.nextBoolean()) core else s"##$core"
      }.distinct.filter(_ != "##")
      if (vocab.nonEmpty) {
        val text = Array.fill(rnd.nextInt(12))(
          if (rnd.nextInt(5) == 0) " " else alphabet(rnd.nextInt(4)).toString)
          .mkString
        val got = toks(text, vocab)
        val want = refTokenize(text, vocab.toSet, "[UNK]")
        assert(got == want, s"text='$text' vocab=$vocab")
      }
    }
  }

  test("trainBpeMerges learns the classic merge order on a pinned corpus") {
    // word counts: low=2, lower=1, newest=1 → pair counts over chars:
    // (l,o)=3 (w/in low×2 + lower) beats all; then (lo,w)=3; etc.
    val docs = Seq("low low lower", "newest").toDF("t")
    val merges = Subword.trainBpeMerges(docs, "t", numMerges = 2)
    assert(merges == Seq(("l", "o"), ("lo", "w")))
    // numMerges = 0 → empty; encoding degenerates to characters
    assert(Subword.trainBpeMerges(docs, "t", numMerges = 0).isEmpty)
  }

  test("trainBpeMerges stops when every word is fused to one symbol") {
    val docs = Seq("ab ab").toDF("t")
    val merges = Subword.trainBpeMerges(docs, "t", numMerges = 10)
    assert(merges == Seq(("a", "b")))
  }

  test("trainBpeMerges enforces the maxWordForms driver bound loudly") {
    val docs = Seq("a b c d e").toDF("t")
    val e = intercept[IllegalArgumentException](
      Subword.trainBpeMerges(docs, "t", numMerges = 1, maxWordForms = 3))
    assert(e.getMessage.contains("maxWordForms"))
    // minCount can restore the bound without raising it
    val docs2 = Seq("a a b c d").toDF("t")
    assert(Subword.trainBpeMerges(docs2, "t", numMerges = 1,
      maxWordForms = 3, minCount = 2L).isEmpty) // only "a" survives, 1 char
  }

  test("bpeEncode reproduces training segmentations; count agrees") {
    val docs = Seq("low low lower", "newest").toDF("t")
    val merges = Subword.trainBpeMerges(docs, "t", numMerges = 2)
    val df = Seq(Some("low lower lowest"), Some(""), None).toDF("t")
    val got = df.select(
      Subword.bpeEncode($"t", merges).as("p"),
      Subword.bpeCount($"t", merges).as("n")).collect()
    // low → [low]; lower → [low, e, r]; lowest → [low, e, s, t]
    assert(got(0).getSeq[String](0) ==
      Seq("low", "low", "e", "r", "low", "e", "s", "t"))
    assert(got(0).getInt(1) == 8)
    assert(got(1).getSeq[String](0) == Seq.empty && got(1).getInt(1) == 0)
    assert(got(2).isNullAt(0) && got(2).isNullAt(1))
  }

  test("BPE merge replacement is left-to-right non-overlapping") {
    // merges [(a,a)] on "aaa" → [aa, a], not [a, aa]
    val df = Seq("aaa aaaa").toDF("t")
    val got = df.select(Subword.bpeEncode($"t", Seq(("a", "a"))).as("p"))
      .as[Seq[String]].head()
    assert(got == Seq("aa", "a", "aa", "aa"))
  }

  test("BPE kernel agrees with an independent reference on random corpora") {
    def refEncodeWord(w: String, merges: Seq[(String, String)]): Seq[String] = {
      var syms = w.map(_.toString).toVector
      var changed = true
      while (changed && syms.length > 1) {
        val applicable = merges.zipWithIndex.filter { case ((l, r), _) =>
          syms.indices.init.exists(i => syms(i) == l && syms(i + 1) == r)
        }
        if (applicable.isEmpty) changed = false
        else {
          val ((l, r), _) = applicable.minBy(_._2)
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.toVector
        }
      }
      syms
    }
    val rnd = new scala.util.Random(31)
    (1 to 30).foreach { _ =>
      val corpus = (1 to 3).map(_ =>
        Array.fill(3 + rnd.nextInt(5))(
          Array.fill(1 + rnd.nextInt(5))("abc"(rnd.nextInt(3))).mkString)
          .mkString(" "))
      val docs = corpus.toDF("t")
      val merges = Subword.trainBpeMerges(docs, "t", numMerges = rnd.nextInt(6))
      val text = Array.fill(2 + rnd.nextInt(4))(
        Array.fill(1 + rnd.nextInt(6))("abc"(rnd.nextInt(3))).mkString)
        .mkString(" ")
      val got = Seq(text).toDF("t")
        .select(Subword.bpeEncode($"t", merges)).as[Seq[String]].head()
      val want = text.split("\\s+").toSeq.flatMap(refEncodeWord(_, merges))
      assert(got == want, s"text='$text' merges=$merges")
    }
  }

  test("BPE merge list round-trips through parquet bit-exactly") {
    val docs = Seq("low low lower", "newest").toDF("t")
    val merges = Subword.trainBpeMerges(docs, "t", numMerges = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_art").toString
    Subword.saveBpeMerges(spark, merges, dir)
    val back = Subword.loadBpeMerges(spark, dir)
    assert(back == merges)
    // served segmentations identical under the loaded artifact
    val df = Seq("low lower lowest").toDF("t")
    val a = df.select(Subword.bpeEncode($"t", merges)).as[Seq[String]].head()
    val b = df.select(Subword.bpeEncode($"t", back)).as[Seq[String]].head()
    assert(a == b)
    // a corrupted (non-contiguous) artifact is refused loudly
    Seq((0L, "a", "b"), (2L, "c", "d")).toDF("rank", "left_sym", "right_sym")
      .write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalArgumentException](Subword.loadBpeMerges(spark, dir))
    assert(e.getMessage.contains("contiguous"))
  }

  test("vocabCoverage: exact per-doc OOV accounting + the vocab bound") {
    val docs = Seq((1L, "aa bb aa cc"), (2L, "aa aa"), (3L, "zz yy"),
      (4L, "")).toDF("doc_id", "text")
    val vocab = Seq("aa", "bb").toDF("piece")
    val got = Subword.vocabCoverage(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((4L, 3L, 0.25)))
    assert(got(2L) == ((2L, 2L, 0.0)))
    assert(got(3L) == ((2L, 0L, 1.0)))
    assert(got(4L) == ((0L, 0L, 0.0)))
    assertThrows[IllegalArgumentException](
      Subword.vocabCoverage(docs, "doc_id", "text", vocab, maxVocab = 1))
  }

  test("matcher rejects degenerate vocabularies") {
    intercept[IllegalArgumentException](new SubwordMatcher(Array.empty, "[UNK]"))
    intercept[IllegalArgumentException](new SubwordMatcher(Array("a", "##"), "[UNK]"))
    // unk survives even when unk itself is not in the vocab
    val m = new SubwordMatcher(Array("q"), "[UNK]")
    val out = m.tokenize(UTF8String.fromString("zz q"))
    assert((0 until out.numElements()).map(i => out.getUTF8String(i).toString) ==
      Seq("[UNK]", "q"))
  }
}
