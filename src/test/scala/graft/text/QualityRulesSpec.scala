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

  test("gopherFlags: GopherSignalsExpr kernel ≡ the HOF rule build") {
    import org.apache.spark.sql.functions._
    // adversarial shapes: tab-only text (space-only trim keeps it),
    // unicode ellipsis, bullets with/without following space, null,
    // empty lines, multi-space runs, supplementary-plane chars
    val texts = Seq(prose, "", null, "\t", "   ", "a\nb\nc",
      "- bullet the of\n* star\n– dash x\n-nospace",
      "ends...\nends…\nno end\n\n\n  spaced line  ",
      "### ## # the of and that " + (1 to 60).map(i => s"w$i").mkString(" "),
      "😀 emoji the of é́ composed", "the the the the",
      (1 to 60).map(i => s"line $i the of...").mkString("\n"))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val flags = Seq("r_word_count", "r_mean_word_len", "r_symbol_ratio",
      "r_alpha_words", "r_bullet_lines", "r_ellipsis_lines",
      "r_stopwords", "gopher_pass")
    // the pre-r19 HOF build, inlined verbatim
    val hof = {
      val staged = docs
        .withColumn("__t", coalesce(col("text"), lit("")))
        .withColumn("__toks", TextFunctions.tokens(col("__t")))
        .withColumn("__lines",
          filter(split(col("__t"), "\n"), l => length(trim(l)) > 0))
      val text = col("__t"); val toks = col("__toks")
      val nTok = size(toks).cast("double")
      val safeN = greatest(nTok, lit(1.0))
      val lines = col("__lines")
      val nLines = greatest(size(lines).cast("double"), lit(1.0))
      val wordCountOk = nTok.between(50.0, 100000.0)
      val meanLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
        .cast("double") / safeN
      val meanLenOk = nTok > 0 && meanLen.between(3.0, 10.0)
      val symbols = (length(text) -
        length(regexp_replace(text, lit("#"), lit("")))).cast("double") +
        size(regexp_extract_all(text, lit("\\.\\.\\.|…"), lit(0))).cast("double")
      val symbolOk = symbols / safeN <= 0.1
      val alphaFrac = size(filter(toks, t => t.rlike("\\p{L}"))).cast("double") / safeN
      val alphaOk = nTok > 0 && alphaFrac >= 0.8
      val bulletFrac = size(filter(lines,
        l => trim(l).rlike("^(•|\\*|-|–)\\s"))).cast("double") / nLines
      val bulletOk = bulletFrac <= 0.9
      val ellipsisFrac = size(filter(lines,
        l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("double") / nLines
      val ellipsisOk = ellipsisFrac <= 0.3
      val stopArr = array(QualityRules.gopherStopwords.map(lit): _*)
      val stopOk = size(array_intersect(array_distinct(toks), stopArr)) >= 2
      staged.select(col("id"), wordCountOk.as(flags(0)), meanLenOk.as(flags(1)),
        symbolOk.as(flags(2)), alphaOk.as(flags(3)), bulletOk.as(flags(4)),
        ellipsisOk.as(flags(5)), stopOk.as(flags(6)),
        (wordCountOk && meanLenOk && symbolOk && alphaOk && bulletOk &&
          ellipsisOk && stopOk).as(flags(7)))
    }
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("id", flags: _*).collect()
        .map(r => r.getLong(0) -> flags.indices.map(i => r.getBoolean(i + 1)))
        .toMap
    assert(collect(QualityRules.gopherFlags(docs, "text")) == collect(hof))
  }

  test("qualityScore: StopwordCountExpr kernel ≡ the HOF stopword filter") {
    import org.apache.spark.sql.functions._
    val docs = Seq("the a of to x", "", "no stop words here",
      "the the the", "mixed the case A OF and").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .withColumn("toks", TextFunctions.tokens(col("text")))
    val stopArr = array(TextFunctions.defaultStopwords.map(lit): _*)
    val hof = docs.select(col("id"),
      size(filter(col("toks"), t => array_contains(stopArr, t))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val kernel = docs.select(col("id"),
      org.apache.spark.sql.graft.ColumnBridge(
        graft.functions.StopwordCountExpr(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("toks")),
          TextFunctions.defaultStopwords)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(kernel == hof)
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
