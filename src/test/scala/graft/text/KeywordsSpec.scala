package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.AhoCorasick
import org.apache.spark.unsafe.types.UTF8String

class KeywordsSpec extends SparkTestBase {
  import spark.implicits._

  private val pats = Seq("scan", "slow scan", "big table", "he", "she", "hers")

  private def matches(text: String): Seq[String] =
    Seq(text).toDF("t")
      .select(Keywords.keywordMatches($"t", pats))
      .as[Seq[String]].head()

  test("overlapping and nested patterns all reported, sorted distinct") {
    // "slow scan" contains "scan" — fail-link output inheritance
    assert(matches("a slow scan here") == Seq("he", "scan", "slow scan"))
    // classic Aho-Corasick: "ushers" hits she, he, hers
    assert(matches("ushers") == Seq("he", "hers", "she"))
    assert(matches("scan scan scan") == Seq("scan")) // distinct
    assert(matches("nothing matc_es") == Seq.empty)
    assert(matches("zzz") == Seq.empty)
  }

  test("case-insensitive matches lower(); case-sensitive does not fold") {
    assert(matches("A SLOW SCAN") == Seq("scan", "slow scan"))
    val cs = Seq("A SLOW SCAN").toDF("t")
      .select(Keywords.keywordMatches($"t", pats, caseInsensitive = false))
      .as[Seq[String]].head()
    assert(cs == Seq.empty)
  }

  test("null text: matches null, tag coalesces to empty, filter keeps row") {
    val df = Seq(Some("big table here"), None, Some("clean")).toDF("t")
    val tagged = Keywords.tagKeywords(df, "t", pats)
      .select($"matched").as[Seq[String]].collect()
    assert(tagged(0) == Seq("big table", "he"))
    assert(tagged(1) == Seq.empty)
    val kept = Keywords.filterBlockedKeywords(df, "t", Seq("big table"))
    assert(kept.count() == 2) // null row survives, clean row survives
  }

  test("keywordProfile counts docs per pattern incl. zero rows") {
    val df = Seq("slow scan here", "scan only", "nothing").toDF("t")
    val prof = Keywords.keywordProfile(df, "t", Seq("scan", "slow scan", "zzz"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prof == Map("scan" -> 2L, "slow scan" -> 1L, "zzz" -> 0L))
  }

  private def mask(text: String, ps: Seq[String]): String =
    Seq(text).toDF("t")
      .select(Keywords.maskKeywords($"t", ps, "<M>"))
      .as[String].head()

  test("maskKeywords: leftmost-longest, adjacency, nesting, case folding") {
    assert(mask("a slow scan here", pats) == "a <M> <M>re")
    // leftmost "ab"-style overlap: the earlier match wins, scan resumes after
    assert(mask("ushers", Seq("she", "hers")) == "u<M>rs")
    // longest at the same start beats the nested shorter
    assert(mask("slow scan", Seq("slow scan", "slow")) == "<M>")
    assert(mask("SLOW SCAN", Seq("slow scan")) == "<M>")
    assert(mask("xyz", pats) == "xyz")
    assert(mask("", pats) == "")
  }

  test("maskKeywords agrees with longest-first regex alternation on random text") {
    val ps = Seq("scan", "slow scan", "an", "ca", "he", "she", "hers")
    val rx = ("(" + ps.sortBy(p => (-p.length, p))
      .map(java.util.regex.Pattern.quote).mkString("|") + ")").r
    val rnd = new scala.util.Random(13)
    val vocab = Array("scan", "slow", "she", "hers", "x", "a", "c", " ")
    (1 to 200).foreach { _ =>
      val text = Array.fill(rnd.nextInt(25))(vocab(rnd.nextInt(vocab.length))).mkString
      val want = rx.replaceAllIn(text.toLowerCase, "<M>")
      assert(mask(text.toLowerCase, ps) == want, s"text='$text'")
    }
  }

  test("automaton agrees with per-pattern contains on random text") {
    val rnd = new scala.util.Random(7)
    val vocab = Array("scan", "slow", "big", "table", "he", "she", "rs", "x")
    val ac = new AhoCorasick(pats.toArray, true)
    (1 to 200).foreach { _ =>
      val text = Array.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length)))
        .mkString(if (rnd.nextBoolean()) " " else "")
      val got = {
        val a = ac.findDistinct(UTF8String.fromString(text))
        (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      }
      val want = pats.distinct.sorted.filter(text.toLowerCase.contains(_))
      assert(got == want, s"text='$text'")
    }
  }

  test("empty and degenerate pattern lists are rejected loudly") {
    intercept[IllegalArgumentException](new AhoCorasick(Array.empty, true))
    intercept[IllegalArgumentException](new AhoCorasick(Array("a", ""), true))
  }
}
