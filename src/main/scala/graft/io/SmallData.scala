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
  * Excel: XLSX is a zip of SpreadsheetML XML parts, so the tabular
  * subset the reference's pandas/openpyxl round-trip uses (one sheet,
  * header row, string/number cells) reads and writes with
  * java.util.zip + the JDK StAX parser — no external codec.
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

  /** Read the first worksheet of an XLSX file: first row = header,
    * header-keyed string rows back (numbers keep their stored lexical
    * form). Handles shared strings (t="s"), inline strings
    * (t="inlineStr"), formula-cached strings (t="str") and numeric
    * cells — the tabular subset pandas/openpyxl emit. Reference
    * read_excel (cdp/helpers/s3_utils.py:1474-1530). */
  def readExcel(spark: SparkSession, path: String): Seq[Map[String, String]] = {
    val parts = readZip(FileOps.readBinaryFile(spark, path))
    val shared = parts.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(Vector.empty)
    val sheetPart = parts.keys
      .filter(_.matches("xl/worksheets/sheet\\d+\\.xml")).toSeq
      .sortBy(n => "\\d+".r.findFirstIn(n).get.toInt).headOption
      .getOrElse(throw new IllegalArgumentException(
        s"readExcel: no worksheet part found in $path"))
    val rows = parseSheet(parts(sheetPart), shared)
    if (rows.isEmpty) Nil
    else {
      val width = rows.map(r => if (r.isEmpty) 0 else r.keys.max + 1).max
      def dense(r: Map[Int, String]) = Seq.tabulate(width)(i => r.getOrElse(i, ""))
      val header = dense(rows.head)
      rows.tail.map(r => header.zip(dense(r)).toMap)
    }
  }

  /** Write rows as a single-sheet XLSX workbook, every cell an inline
    * string — the minimal valid SpreadsheetML package, readable by
    * Excel / openpyxl / pandas. Reference write_excel
    * (cdp/helpers/s3_utils.py:1532-1598). */
  def writeExcel(
      spark: SparkSession,
      path: String,
      rows: Seq[Map[String, Any]],
      columns: Seq[String] = Nil,
      sheetName: String = "Sheet1"): Unit = {
    val cols = if (columns.nonEmpty) columns
      else rows.headOption.map(_.keys.toSeq).getOrElse(Nil)
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def cell(rowIdx: Int, colIdx: Int, v: String): String =
      s"""<c r="${colLetters(colIdx)}${rowIdx + 1}" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(v)}</t></is></c>"""
    def rowXml(rowIdx: Int, vals: Seq[String]): Unit = {
      sb.append(s"""<row r="${rowIdx + 1}">""")
      vals.zipWithIndex.foreach { case (v, c) => sb.append(cell(rowIdx, c, v)) }
      sb.append("</row>")
    }
    rowXml(0, cols)
    rows.zipWithIndex.foreach { case (r, i) =>
      rowXml(i + 1, cols.map(c => r.get(c).map(String.valueOf).getOrElse("")))
    }
    sb.append("</sheetData></worksheet>")

    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        """</Types>"""
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>"""
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        s"""<sheets><sheet name="${xmlEscape(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val workbookRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        """</Relationships>"""

    FileOps.writeBinaryFile(spark, path, buildZip(Seq(
      "[Content_Types].xml" -> contentTypes,
      "_rels/.rels" -> rels,
      "xl/workbook.xml" -> workbook,
      "xl/_rels/workbook.xml.rels" -> workbookRels,
      "xl/worksheets/sheet1.xml" -> sb.toString)))
  }

  private def colLetters(idx: Int): String = {
    var n = idx + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def readZip(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = scala.collection.mutable.Map.empty[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out(e.getName) = zin.readAllBytes()
      e = zin.getNextEntry
    }
    zin.close()
    out.toMap
  }

  private def buildZip(parts: Seq[(String, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    parts.foreach { case (name, content) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  /** sharedStrings.xml → indexed strings (concatenating rich-text runs). */
  private def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val reader = xmlReader(bytes)
    val out = Vector.newBuilder[String]
    var current: StringBuilder = null
    var inT = false
    while (reader.hasNext) {
      reader.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          reader.getLocalName match {
            case "si" => current = new StringBuilder
            case "t" if current != null => inT = true
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT =>
          current.append(reader.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          reader.getLocalName match {
            case "t" => inT = false
            case "si" if current != null => out += current.toString; current = null
            case _ =>
          }
        case _ =>
      }
    }
    reader.close()
    out.result()
  }

  /** worksheet XML → per-row sparse (columnIndex → value) maps. */
  private def parseSheet(
      bytes: Array[Byte], shared: Vector[String]): Seq[Map[Int, String]] = {
    val reader = xmlReader(bytes)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Map[Int, String]]
    var row: scala.collection.mutable.Map[Int, String] = null
    var colIdx = -1
    var nextSeqCol = 0
    var cellType = ""
    var inV = false
    var inIsT = false
    val text = new StringBuilder
    while (reader.hasNext) {
      reader.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          reader.getLocalName match {
            case "row" =>
              row = scala.collection.mutable.Map.empty; nextSeqCol = 0
            case "c" if row != null =>
              val ref = Option(reader.getAttributeValue(null, "r"))
              colIdx = ref.map(refToColIdx).getOrElse(nextSeqCol)
              nextSeqCol = colIdx + 1
              cellType = Option(reader.getAttributeValue(null, "t")).getOrElse("n")
              text.clear()
            case "v" => inV = true
            case "t" if cellType == "inlineStr" => inIsT = true
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inV || inIsT =>
          text.append(reader.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          reader.getLocalName match {
            case "v" => inV = false
            case "t" => inIsT = false
            case "c" if row != null && colIdx >= 0 =>
              val raw = text.toString
              val value = cellType match {
                case "s" => shared.lift(raw.trim.toInt).getOrElse("")
                case _ => raw
              }
              if (value.nonEmpty) row(colIdx) = value
              colIdx = -1
            case "row" if row != null =>
              rows += row.toMap; row = null
            case _ =>
          }
        case _ =>
      }
    }
    reader.close()
    rows.toSeq
  }

  private def refToColIdx(ref: String): Int = {
    var i = 0
    var n = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      n = n * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    n - 1
  }

  private def xmlReader(bytes: Array[Byte]): javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    // not strictly needed for workbook parts, but never resolve anything
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
  }
}
