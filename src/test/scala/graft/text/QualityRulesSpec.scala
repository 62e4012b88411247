package graft.text

import graft.SparkTestBase

class QualityRulesSpec extends SparkTestBase {
  import spark.implicits._

  private val prose = (1 to 60).map(i => s"word$i").mkString(" ") +
    " the of and that" // 64 words, stopwords present

  test("gopherFlags: healthy prose passes every rule") {
    val r = QualityRules.gopherFlags(Seq((1L, prose)).toDF("id", "text"), "text")
      .select("r_word_count", "r_mean_word_len", "r_symbol_ratio",
        "r_alpha_words", "r_bullet_lines", "r_ellipsis_lines",
        "r_stopwords", "gopher_pass").head()
    assert((0 until 8).forall(r.getBoolean), s"expected all-pass, got $r")
  }

  test("each rule fails on its designed violation") {
    val cases = Seq(
      // too short
      "the of one two" -> "r_word_count",
      // mean word length > 10
      (Seq.fill(60)("extraordinarily-long-token").mkString(" ") + " the of") -> "r_mean_word_len",
      // hash-symbol spam
      ((1 to 60).map(i => s"w$i #").mkString(" ") + " the of") -> "r_symbol_ratio",
      // numeric tokens
      ((1 to 60).map(_.toString).mkString(" ") + " 1 2 3") -> "r_alpha_words",
      // every line a bullet
      (1 to 60).map(i => s"- item $i the of").mkString("\n") -> "r_bullet_lines",
      // every line ellipsis-terminated
      (1 to 60).map(i => s"line $i the of more...").mkString("\n") -> "r_ellipsis_lines",
      // no stopwords
      (1 to 60).map(i => s"w$i").mkString(" ") -> "r_stopwords")
    cases.foreach { case (text, rule) =>
      val r = QualityRules.gopherFlags(Seq((1L, text)).toDF("id", "text"), "text")
        .select(rule, "gopher_pass").head()
      assert(!r.getBoolean(0), s"$rule should fail for its fixture")
      assert(!r.getBoolean(1), s"gopher_pass must fail when $rule fails")
    }
  }

  test("null text fails closed with non-null flags") {
    val r = QualityRules.gopherFlags(
      Seq((1L, Option.empty[String])).toDF("id", "text"), "text")
      .select("gopher_pass", "r_word_count").head()
    assert(!r.isNullAt(0) && !r.getBoolean(0) && !r.getBoolean(1))
  }

  test("gopherFilter keeps passers with original schema; report counts failures") {
    val df = Seq((1L, prose), (2L, "too short the of")).toDF("id", "text")
    val kept = QualityRules.gopherFilter(df, "text")
    assert(kept.columns.toSeq == Seq("id", "text"))
    assert(kept.select("id").as[Long].collect().toSeq == Seq(1L))
    val rep = QualityRules.gopherReport(df, "text").head()
    assert(rep.getAs[Long]("n_docs") == 2L)
    assert(rep.getAs[Long]("fail_word_count") == 1L)
    assert(rep.getAs[Double]("pass_rate") == 0.5)
  }
}
