package graft.operators

import graft.SparkTestBase

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def left = Seq("kitten", "flaw", "zebra").toDF("a")
  private def right = Seq("sitting", "kitten", "law", "flaws", "zeal").toDF("b")

  test("fuzzyJoin matches within distance under shared-prefix blocking") {
    val out = FuzzyJoin.fuzzyJoin(left, right, "a", "b", maxDistance = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // kitten-sitting d=3 (out); kitten-kitten d=0; flaw-flaws d=1;
    // flaw-law d=1 but blocked (prefix f vs l); zebra-zeal d=3 (out)
    assert(out == Set(("kitten", "kitten", 0L), ("flaw", "flaws", 1L)))
  }

  test("fuzzyJoin cartesian mode recovers the cross-block pair") {
    val out = FuzzyJoin.fuzzyJoin(left, right, "a", "b",
      maxDistance = 2, blockPrefixLen = 0, allowCartesian = true)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out.contains(("flaw", "law")))
    intercept[IllegalArgumentException] {
      FuzzyJoin.fuzzyJoin(left, right, "a", "b", maxDistance = 2, blockPrefixLen = 0)
    }
  }

  test("fuzzyJoin length band prunes before levenshtein") {
    // same prefix but length difference 4 > maxDistance 1
    val l = Seq("abcdefgh").toDF("a")
    val r = Seq("abcd").toDF("b")
    assert(FuzzyJoin.fuzzyJoin(l, r, "a", "b", maxDistance = 1).count() == 0)
  }
}
