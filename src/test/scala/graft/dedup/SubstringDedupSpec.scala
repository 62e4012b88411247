package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Exact substring (span) dedup: first occurrence survives, later
  * verbatim spans are cut, short docs pass through, and the profile
  * fractions match hand counts. */
class SubstringDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def byId(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap

  test("first occurrence survives; later copies of the span are removed") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "intro words alpha beta gamma closing"),
      (3L, "tail only here")).toDF("doc_id", "text")
    val out = byId(SubstringDedup.dedupSubstrings(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect())
    // "alpha beta gamma" occurs in docs 1 and 2; doc 1 (earlier) keeps it
    assert(out(1L) == (("alpha beta gamma delta epsilon", 5L, 0L)))
    assert(out(2L) == (("intro words closing", 6L, 3L)))
    assert(out(3L) == (("tail only here", 3L, 0L)))
  }

  test("within-document repeats are cut after the first occurrence") {
    val docs = Seq(
      (7L, "x y z pad1 pad2 x y z")).toDF("doc_id", "text")
    val out = byId(SubstringDedup.dedupSubstrings(docs, "doc_id", "text", k = 3).collect())
    assert(out(7L) == (("x y z pad1 pad2", 8L, 3L)))
  }

  test("overlapping duplicated windows remove the union of covered tokens") {
    // the 4-token run "a b c d" duplicates; with k=3 BOTH windows
    // ("a b c", "b c d") duplicate and the later copy loses all 4 tokens
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "pre a b c d post")).toDF("doc_id", "text")
    val out = byId(SubstringDedup.dedupSubstrings(docs, "doc_id", "text", k = 3)
      .collect())
    assert(out(1L) == (("a b c d", 4L, 0L)))
    assert(out(2L) == (("pre post", 6L, 4L)))
  }

  test("docs shorter than k tokens have no windows and pass through") {
    val docs = Seq(
      (1L, "one two"), (2L, "one two")).toDF("doc_id", "text")
    val out = byId(SubstringDedup.dedupSubstrings(docs, "doc_id", "text", k = 3).collect())
    assert(out(1L) == (("one two", 2L, 0L)) && out(2L) == (("one two", 2L, 0L)))
  }

  test("a fully duplicated document empties (one row per input doc kept)") {
    val docs = Seq(
      (1L, "p q r s"), (2L, "p q r s")).toDF("doc_id", "text")
    val out = byId(SubstringDedup.dedupSubstrings(docs, "doc_id", "text", k = 4).collect())
    assert(out(1L) == (("p q r s", 4L, 0L)))
    assert(out(2L) == (("", 4L, 4L)))
  }

  test("result is a pure function of the data, not partitioning") {
    val docs = (1L to 60L)
      .map(i => (i, if (i % 3 == 0) s"common span here always u$i" else s"unique text u$i only"))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      SubstringDedup.dedupSubstrings(d, "doc_id", "text", k = 4)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(run(docs.repartition(1)) == run(docs.repartition(13)))
  }

  test("substringDupProfile counts windows and duplicated windows") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),   // 2 windows, k=3
      (2L, "alpha beta gamma other"),   // shares "alpha beta gamma"
      (3L, "no dups at all here"),      // 3 windows, none duplicated
      (4L, "ab")).toDF("doc_id", "text") // < k: 0 windows
    val out = SubstringDedup.substringDupProfile(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((3L, 0L, 0.0)))
    assert(out(4L) == ((0L, 0L, 0.0)))
  }

  test("bad k throws") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      SubstringDedup.dedupSubstrings(docs, "doc_id", "text", k = 0))
  }

  test("hashKeys scale path produces identical output to the exact string-key path") {
    val docs = (1L to 80L)
      .map(i => (i, if (i % 4 == 0) s"shared span of text here u$i tail" else s"unique words u$i only here"))
      .toDF("doc_id", "text")
    def run(hash: Boolean) =
      SubstringDedup.dedupSubstrings(docs, "doc_id", "text", k = 4, hashKeys = hash)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(run(true) == run(false))
    def prof(hash: Boolean) =
      SubstringDedup.substringDupProfile(docs, "doc_id", "text", k = 4, hashKeys = hash)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
    assert(prof(true) == prof(false))
  }

  test("dedupSubstringsAgainst: base spans cut entirely, batch dups keep first") {
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "intro alpha beta gamma outro"),      // base span: cut, no survivor
      (11L, "fresh shared span here first"),       // batch-dup span: first kept
      (12L, "again fresh shared span here too"),   // hmm: "shared span here" dup
      (13L, "nothing in common at all")).toDF("doc_id", "text")
    val out = SubstringDedup.dedupSubstringsAgainst(base, batch, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    assert(out(10L) == (("intro outro", 3L)))
    assert(out(11L) == (("fresh shared span here first", 0L)))
    // "shared span here" (tokens 3..5 of doc 12 at positions 2..4 in its text?) —
    // doc 12 = "again fresh shared span here too": windows incl "shared span here"
    // duplicated vs doc 11 (earlier id) -> doc 12 loses those 3 tokens... but
    // overlapping windows "fresh shared span"/"span here too"? "fresh shared span"
    // also appears in doc 11 -> both dup windows cut union {2,3,4,5} of doc 12
    assert(out(12L) == (("again too", 4L)))
    assert(out(13L) == (("nothing in common at all", 0L)))
  }

  test("fused batch keys ≡ windowKeys (the r20 single-tokenize append)") {
    // appendSubstringBatch now takes the batch's window keys off the
    // clean pass's own checkpointed window frame instead of a second
    // windowKeys() tokenize — the two must stay row-identical
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon"),
      (11L, "beta gamma delta zeta eta"),
      (12L, "short"),
      (13L, "")).toDF("doc_id", "text")
    val base = Seq("alpha beta gamma").toDF("w")
    for (hashed <- Seq(true, false)) {
      val baseKeys =
        if (hashed) SubstringDedup.windowKeys(
          Seq((1L, "alpha beta gamma x y")).toDF("doc_id", "text"),
          "doc_id", "text", k = 3, hashKeys = true)
        else base
      val (_, fusedKeys) = SubstringDedup.dedupAgainstKeysWithBatchKeys(
        baseKeys, batch, "doc_id", "text", k = 3,
        withinBatch = true, hashKeys = hashed)
      val direct = SubstringDedup.windowKeys(
        batch, "doc_id", "text", k = 3, hashKeys = hashed)
      assert(fusedKeys.columns.toSeq == Seq("w"))
      assert(fusedKeys.collect().map(_.get(0)).toSet ==
        direct.collect().map(_.get(0)).toSet)
    }
  }

  test("dedupSubstringsAgainst: withinBatch=false cuts only base matches") {
    val base = Seq((1L, "x y z w")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "a b c pad"), (11L, "tail a b c")).toDF("doc_id", "text")
    val out = SubstringDedup.dedupSubstringsAgainst(base, batch, "doc_id", "text",
      k = 3, withinBatch = false)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(10L -> 0L, 11L -> 0L))
    val withDups = SubstringDedup.dedupSubstringsAgainst(base, batch, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(withDups == Map(10L -> 0L, 11L -> 3L))
  }

  test("dedupSubstringsAgainst: hashKeys parity and short docs pass through") {
    val base = (1L to 30L).map(i => (i, s"base span common text b$i")).toDF("doc_id", "text")
    val batch = (100L to 130L)
      .map(i => (i, if (i % 3 == 0) s"u$i base span common text tail" else s"u$i short"))
      .toDF("doc_id", "text")
    def run(hash: Boolean) =
      SubstringDedup.dedupSubstringsAgainst(base, batch, "doc_id", "text", k = 4,
        hashKeys = hash)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    val exact = run(false)
    assert(run(true) == exact)
    // "u$i short" docs have < 4 tokens: unchanged
    assert(exact.filter(_._2.endsWith("short")).forall(_._3 == 0L))
  }
}
