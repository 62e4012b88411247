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
