package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → training-text extraction: the stage a web-crawl curation
  * pipeline runs BEFORE every text-grain operator in this library
  * (quality, dedup, langid all assume plain text). The reference has
  * no analogue; semantics follow the public extraction recipes used
  * by large web corpora (strip script/style/comments, break block
  * tags into newlines, drop tags, decode the frequent entities,
  * collapse whitespace; flag documents whose visible text is
  * dominated by anchor text; drop short boilerplate navigation
  * lines).
  *
  * Everything here is regex-only `org.apache.spark.sql.functions`
  * composition — codegen'd narrow passes, no UDFs, no shuffles, so
  * the stage is scan-speed at any corpus size and every operator is
  * exactly SQL-replayable (patterns are RE2-compatible: no
  * backreferences, no lookarounds, no \Q..\E quoting).
  */
object Html {

  /** script/style/comment blocks (dotall, lazy) — removed FIRST so
    * their contents never leak into visible text. */
  private val blockPattern =
    "(?s)(?i)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->"

  /** Block-level boundaries that become LINE BREAKS in visible text,
    * so the line grain survives tag removal. */
  private val breakPattern =
    "(?i)<(?:br|/p|/div|/li|/h[1-6]|/tr|/ul|/ol|/table|/blockquote|/title|/head)[^>]*>"

  /** Any remaining tag (becomes a space: `a</b><b>b` keeps its word
    * boundary). */
  private val tagPattern = "(?s)<[^>]*>"

  /** The six entities worth decoding without an HTML parser (none of
    * these strings contains a regex metacharacter); the
    * numeric-entity tail is left intact — it is rare and harmless to
    * downstream token statistics. */
  private val entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")

  private def decodeEntities(c: Column): Column =
    entities.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, lit(from), lit(to))
    }

  /** Visible text of an HTML column, LINE-STRUCTURED: blocks
    * stripped, block boundaries → newlines, remaining tags → spaces,
    * frequent entities decoded, runs of intra-line whitespace
    * collapsed to one space, blank lines dropped, trimmed.
    * Null → null. */
  def stripHtml(html: Column): Column = {
    val noBlocks = regexp_replace(html, lit(blockPattern), lit(""))
    val withBreaks = regexp_replace(noBlocks, lit(breakPattern), lit("\n"))
    val noTags = regexp_replace(withBreaks, lit(tagPattern), lit(" "))
    val decoded = decodeEntities(noTags)
    val oneSpace = regexp_replace(decoded, lit("[^\\S\\n]+"), lit(" "))
    val tightLines = regexp_replace(oneSpace, lit(" ?\\n ?"), lit("\n"))
    // Spark's trim strips SPACES only — newline padding needs btrim's
    // character set
    trim(regexp_replace(tightLines, lit("\\n+"), lit("\n")), " \n\t\r")
  }

  /** `<title>` contents (first match, entity-decoded, whitespace
    * collapsed); empty string when absent — the join-safe sentinel
    * (null means null input). */
  def extractTitle(html: Column): Column =
    trim(regexp_replace(decodeEntities(
      regexp_extract(html, "(?si)<title[^>]*>(.*?)</title>", 1)),
      lit("\\s+"), lit(" ")))

  /** Fraction of visible characters living inside `<a>` anchors —
    * the classic boilerplate/navigation signal (link farms and nav
    * pages score near 1, article bodies near 0). Anchor text is
    * measured tag-stripped and entity-decoded like [[stripHtml]]
    * output, so the ratio is extraction-faithful. Empty visible
    * text → 0.0; null → null. */
  def linkDensity(html: Column): Column = {
    // one codegen'd kernel walk (AnchorCharsExpr) — the previous
    // formulation folded an interpreted `aggregate` lambda over the
    // extracted anchors, re-dispatching the tag-strip + entity-decode
    // + collapse regex chain through CodegenFallback per anchor; the
    // kernel runs the IDENTICAL java.util.regex chain once per
    // document inside whole-stage codegen (HtmlSpec parity pin over
    // entity/malformed/unicode shapes; r20 optimization round).
    val anchorChars = org.apache.spark.sql.graft.ColumnBridge(
      graft.functions.AnchorCharsExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(html)))
    val totalChars = length(stripHtml(html)).cast("long")
    when(totalChars === 0, lit(0.0))
      .otherwise(least(anchorChars.cast("double") / totalChars.cast("double"),
        lit(1.0)))
  }

  /** Drop boilerplate LINES from line-structured extracted text: a
    * line survives when it has at least `minWords` whitespace words
    * OR ends in terminal punctuation (./!/?/:/") — the public
    * heuristic separating prose from nav crumbs ("Home", "Next >",
    * "(c) 2024"). Re-joined with single newlines; null → null. */
  def dropBoilerplateLines(text: Column, minWords: Int = 5): Column = {
    val keep = (line: Column) =>
      size(split(trim(line), " ")) >= minWords ||
        trim(line).rlike("[.!?:\"]$")
    when(text.isNull, lit(null).cast("string")).otherwise(
      array_join(filter(split(text, "\\n"),
        l => keep(l) && (length(trim(l)) > 0)), "\n"))
  }

  /** The composed front door: one narrow codegen pass adding
    * (title, link_density, text_extracted) to an HTML frame — the
    * exact input shape the quality/dedup/langid families expect.
    * Filter on `link_density` BEFORE the heavier downstream stages;
    * the predicate pushes to the scan. */
  def extract(
      df: DataFrame,
      htmlCol: String,
      minWords: Int = 5): DataFrame =
    df.withColumn("title", extractTitle(col(htmlCol)))
      .withColumn("link_density", round(linkDensity(col(htmlCol)), 6))
      .withColumn("text_extracted",
        dropBoilerplateLines(stripHtml(col(htmlCol)), minWords))
}
