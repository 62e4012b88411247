package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class HtmlSpec extends SparkTestBase {
  import spark.implicits._

  test("stripHtml removes blocks/tags, decodes entities, keeps line grain") {
    val html =
      """<html><head><title>My &amp; Title</title>
        |<style>p { color: red }</style>
        |<script>var x = "<p>not text</p>";</script></head>
        |<body><!-- hidden --><h1>Header One</h1>
        |<p>First   paragraph &lt;here&gt;.</p><p>Second&nbsp;one.</p>
        |</body></html>""".stripMargin
    val got = Seq(html).toDF("h").select(Html.stripHtml($"h")).head().getString(0)
    assert(got == "My & Title\nHeader One\nFirst paragraph <here>.\nSecond one.")
  }

  test("stripHtml: null -> null, empty/tag-only -> empty string") {
    val got = Seq(Option.empty[String], Some(""), Some("<div><br></div>"))
      .toDF("h").select(Html.stripHtml($"h")).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == Seq(null, "", ""))
  }

  test("extractTitle: first title, entity-decoded; absent -> empty") {
    val got = Seq(
      "<title> A &quot;B&quot;\n C </title><title>x</title>",
      "<p>no title</p>", "<TITLE>upper</TITLE>")
      .toDF("h").select(Html.extractTitle($"h")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("A \"B\" C", "", "upper"))
  }

  test("linkDensity: nav page ~1, article ~low, no text -> 0") {
    val nav = "<ul><li><a href='/'>Home</a></li><li><a href='/x'>About us</a></li></ul>"
    val art = "<p>A long article body with many words of real prose.</p><a href='/'>x</a>"
    val rows = Seq(nav, art, "<div></div>").toDF("h")
      .select(round(Html.linkDensity($"h"), 2)).collect().map(_.getDouble(0))
    assert(rows(0) > 0.85 && rows(1) < 0.1 && rows(2) == 0.0)
  }

  test("dropBoilerplateLines keeps prose and punctuation-terminated lines") {
    val text = "Home\nThe quick brown fox jumps over the dog\nNext >\nShort but ends.\n"
    val got = Seq(text).toDF("t")
      .select(Html.dropBoilerplateLines($"t")).head().getString(0)
    assert(got == "The quick brown fox jumps over the dog\nShort but ends.")
  }

  test("extract composes title + link_density + extracted text") {
    val html = "<title>T</title><p>One two three four five six seven.</p><a href='/'>Nav</a>"
    val r = Html.extract(Seq((1L, html)).toDF("id", "html"), "html")
      .select("title", "text_extracted").head()
    assert(r.getString(0) == "T")
    assert(r.getString(1) == "One two three four five six seven.")
  }

  test("linkDensity: AnchorCharsExpr kernel ≡ the HOF anchor fold") {
    // adversarial shapes: every entity (incl. double-encoded &amp;lt;
    // whose single-level decode is order-sensitive), malformed/unclosed
    // /nested/uppercase anchors, anchors spanning newlines (dotall),
    // tags inside anchors, anchors inside script/style/comment blocks
    // (must NOT count), numeric entities (left intact), unicode incl.
    // supplementary-plane emoji, whitespace-only anchors, <a> with no
    // attributes vs <abbr> (must not match), null and empty html
    val htmls = Seq(
      null,
      "",
      "no anchors at all",
      "<a href='/x'>plain</a>",
      "<a>bare open</a> and <abbr>not an anchor</abbr>",
      "<A HREF='/y'>UPPER case</A>",
      "<a href='/1'>first</a><a href='/2'>second</a>",
      "<a href='/n'>spans\nmultiple\nlines</a>",
      "<a href='/t'><b>nested <i>tags</i></b> inside</a>",
      "<a href='/e'>&amp;lt; stays literal &lt; decodes &nbsp;&quot;&#39;&gt;</a>",
      "<a href='/d'>&amp;amp; one level only</a>",
      "<a href='/u'>😀 emoji ünïcode 𝕊𝕦𝕡𝕡</a>",
      "<a href='/w'>   </a><a href='/w2'>\t\n </a>",
      "<a href='/num'>&#8364; numeric entity intact</a>",
      "<script>var s = \"<a href='/s'>inside script</a>\";</script><a href='/o'>outside</a>",
      "<style>a { color: red }</style><!-- <a href='/c'>comment</a> --><a>kept</a>",
      "<a href='/broken'>unclosed anchor runs to end",
      "<p>before</p><a\nhref='/nl'>attr on new line</a><p>after</p>")
    val docs = htmls.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "html")
    // the pre-r20 HOF fold, inlined verbatim (Html.scala's private
    // patterns copied literally)
    val blockPattern =
      "(?s)(?i)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->"
    val tagPattern = "(?s)<[^>]*>"
    val entities = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
    def decode(c: org.apache.spark.sql.Column) =
      entities.foldLeft(c) { case (acc, (f, t)) =>
        regexp_replace(acc, lit(f), lit(t))
      }
    val anchorInner = regexp_extract_all(
      regexp_replace(col("html"), lit(blockPattern), lit("")),
      lit("(?si)<a[\\s>].*?</a>"), lit(0))
    val hofChars = aggregate(anchorInner, lit(0L),
      (acc, a) => acc + length(trim(regexp_replace(
        decode(regexp_replace(a, lit(tagPattern), lit(" "))),
        lit("\\s+"), lit(" ")))).cast("long"))
    def collectL(c: org.apache.spark.sql.Column) =
      docs.select(col("id"), c.as("n")).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))))
        .toMap
    val kernel = collectL(org.apache.spark.sql.graft.ColumnBridge(
      graft.functions.AnchorCharsExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("html")))))
    assert(kernel == collectL(hofChars))
    // and the composed linkDensity column is unchanged end to end
    val hofDensity = {
      val totalChars = length(Html.stripHtml(col("html"))).cast("long")
      when(totalChars === 0, lit(0.0))
        .otherwise(least(hofChars.cast("double") / totalChars.cast("double"),
          lit(1.0)))
    }
    def collectD(c: org.apache.spark.sql.Column) =
      docs.select(col("id"), c.as("d")).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1))))
        .toMap
    assert(collectD(Html.linkDensity(col("html"))) == collectD(hofDensity))
  }

  test("entity decode is single-level: amp LAST so &amp;lt; stays literal &lt;") {
    // double-encoded entities must decode exactly ONE level — decoding
    // amp first would cascade "&amp;lt;" -> "&lt;" -> "<" and corrupt
    // text that legitimately DISPLAYS "&lt;"
    val df = Seq("<p>a &amp;lt; b</p>", "<p>5 &lt; 6 &amp;&amp; 7 &gt; 2</p>")
      .toDF("html")
    val got = df.select(Html.stripHtml($"html").as("t")).collect().map(_.getString(0))
    assert(got(0) == "a &lt; b")
    assert(got(1) == "5 < 6 && 7 > 2")
  }
}
