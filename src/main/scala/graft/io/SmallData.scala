package graft.io

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession

/** Driver-side small-data IO over any FileSystem scheme.
  *
  * Reference: cdp/helpers/s3_utils.py:1215-1598 — the pandas
  * read/write csv/json/excel family for small lookup tables and
  * outputs that do not warrant a distributed job. Scala-first these
  * work on Seq[Map[colName -> value]] through the same
  * org.apache.hadoop.fs.FileSystem used by FileOps, so s3a:// /
  * hdfs:// / gs:// / file:// all behave identically.
  *
  * Excel is intentionally NOT implemented: the reference uses
  * openpyxl; no spreadsheet codec ships in this environment and
  * pulling one in is not possible offline — [[readExcel]] throws
  * UnsupportedOperationException documenting the gap honestly.
  */
object SmallData {

  private val mapper = new ObjectMapper()

  // ------------------------------------------------------------- CSV

  /** RFC-4180-ish parser: quoted fields, doubled quotes, embedded
    * commas/newlines. Returns header-keyed rows. */
  def readCsv(spark: SparkSession, path: String): Seq[Map[String, String]] = {
    val text = FileOps.readTextFile(spark, path)
    val rows = parseCsv(text)
    if (rows.isEmpty) Nil
    else {
      val header = rows.head
      rows.tail.map(r => header.zipAll(r, "", "").toMap)
    }
  }

  def writeCsv(
      spark: SparkSession,
      path: String,
      rows: Seq[Map[String, Any]],
      columns: Seq[String] = Nil): Unit = {
    val cols = if (columns.nonEmpty) columns else rows.headOption.map(_.keys.toSeq).getOrElse(Nil)
    val sb = new StringBuilder
    sb.append(cols.map(quote).mkString(",")).append('\n')
    rows.foreach { r =>
      sb.append(cols.map(c => quote(r.get(c).map(_.toString).getOrElse(""))).mkString(","))
      sb.append('\n')
    }
    FileOps.writeTextFile(spark, path, sb.toString)
  }

  private def quote(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  private[io] def parseCsv(text: String): Seq[Seq[String]] = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val row = scala.collection.mutable.ArrayBuffer.empty[String]
    val field = new StringBuilder
    var inQuotes = false
    var i = 0
    def endField(): Unit = { row += field.toString; field.clear() }
    def endRow(): Unit = {
      endField()
      if (row.exists(_.nonEmpty) || row.size > 1) rows += row.toSeq
      row.clear()
    }
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQuotes) {
        if (c == '"' && i + 1 < text.length && text.charAt(i + 1) == '"') {
          field.append('"'); i += 1
        } else if (c == '"') inQuotes = false
        else field.append(c)
      } else c match {
        case '"'  => inQuotes = true
        case ','  => endField()
        case '\r' => if (i + 1 >= text.length || text.charAt(i + 1) != '\n') endRow()
        case '\n' => endRow()
        case ch   => field.append(ch)
      }
      i += 1
    }
    if (field.nonEmpty || row.nonEmpty) endRow()
    rows.toSeq
  }

  // ------------------------------------------------------------ JSON

  /** Read a JSON file into plain Scala values (maps/lists/scalars). */
  def readJson(spark: SparkSession, path: String): Any =
    fromJackson(mapper.readTree(FileOps.readTextFile(spark, path)))

  def writeJson(spark: SparkSession, path: String, value: Any): Unit =
    FileOps.writeTextFile(spark, path, toJsonString(value))

  def toJsonString(value: Any): String =
    mapper.writeValueAsString(toJackson(value))

  private def fromJackson(n: com.fasterxml.jackson.databind.JsonNode): Any =
    if (n.isObject) n.properties().asScala.map(e => e.getKey -> fromJackson(e.getValue)).toMap
    else if (n.isArray) n.elements().asScala.map(fromJackson).toList
    else if (n.isLong || n.isInt) n.asLong()
    else if (n.isNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else if (n.isNull) null
    else n.asText()

  private def toJackson(v: Any): Object = v match {
    case m: Map[_, _]   => m.map { case (k, vv) => k.toString -> toJackson(vv) }.asJava
    case s: Seq[_]      => s.map(toJackson).asJava
    case other          => other.asInstanceOf[Object]
  }

  // ----------------------------------------------------------- Excel

  /** Reference read_excel/write_excel (s3_utils.py:1474-1598). No
    * spreadsheet codec is available offline in this environment. */
  def readExcel(spark: SparkSession, path: String): Nothing =
    throw new UnsupportedOperationException(
      "Excel IO requires a spreadsheet codec (reference uses openpyxl); " +
        "none is available in this offline environment — convert to CSV.")
}
