package graft.io

import graft.SparkTestBase

class SmallDataSpec extends SparkTestBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_smalldata").toString

  test("csv round-trip with quoting, commas and embedded newlines") {
    val dir = tmp()
    val rows = Seq(
      Map[String, Any]("name" -> "plain", "note" -> "simple"),
      Map[String, Any]("name" -> "has, comma", "note" -> "with \"quotes\""),
      Map[String, Any]("name" -> "multi\nline", "note" -> ""))
    SmallData.writeCsv(spark, s"$dir/t.csv", rows, Seq("name", "note"))
    val back = SmallData.readCsv(spark, s"$dir/t.csv")
    assert(back.size == 3)
    assert(back(1) == Map("name" -> "has, comma", "note" -> "with \"quotes\""))
    assert(back(2)("name") == "multi\nline")
  }

  test("readCsv on empty file returns no rows") {
    val dir = tmp()
    FileOps.writeTextFile(spark, s"$dir/empty.csv", "")
    assert(SmallData.readCsv(spark, s"$dir/empty.csv").isEmpty)
  }

  test("json round-trip preserves nesting and types") {
    val dir = tmp()
    val value = Map("name" -> "x", "n" -> 3L, "ratio" -> 0.5,
      "flags" -> List(true, false), "inner" -> Map("k" -> "v"))
    SmallData.writeJson(spark, s"$dir/d.json", value)
    assert(SmallData.readJson(spark, s"$dir/d.json") == value)
  }

  test("xlsx round-trip: header, values, escapes, missing cells") {
    val dir = tmp()
    val rows = Seq(
      Map[String, Any]("name" -> "plain", "n" -> 3, "note" -> "a & b < c"),
      Map[String, Any]("name" -> "second", "n" -> 4L)) // note missing
    SmallData.writeExcel(spark, s"$dir/t.xlsx", rows, Seq("name", "n", "note"))
    val back = SmallData.readExcel(spark, s"$dir/t.xlsx")
    assert(back.size == 2)
    assert(back.head == Map("name" -> "plain", "n" -> "3", "note" -> "a & b < c"))
    assert(back(1) == Map("name" -> "second", "n" -> "4", "note" -> ""))
  }

  test("readExcel handles shared strings, numbers and sparse refs") {
    // hand-built workbook the way openpyxl/pandas lay one out: cells
    // reference sharedStrings.xml (t="s") and skip empty columns
    val dir = tmp()
    val shared =
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        "<si><t>city</t></si><si><t>pop</t></si><si><r><t>Lon</t></r><r><t>don</t></r></si></sst>"
    val sheet =
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>""" +
        """<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>8.9</v></c></row>""" +
        """<row r="3"><c r="B3"><v>42</v></c></row>""" + // A3 absent
        "</sheetData></worksheet>"
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    Seq("xl/sharedStrings.xml" -> shared, "xl/worksheets/sheet1.xml" -> sheet)
      .foreach { case (n, c) =>
        zos.putNextEntry(new java.util.zip.ZipEntry(n))
        zos.write(c.getBytes("UTF-8")); zos.closeEntry()
      }
    zos.close()
    FileOps.writeBinaryFile(spark, s"$dir/h.xlsx", bos.toByteArray)
    val back = SmallData.readExcel(spark, s"$dir/h.xlsx")
    assert(back == Seq(
      Map("city" -> "London", "pop" -> "8.9"), // rich-text runs concatenated
      Map("city" -> "", "pop" -> "42")))
  }
}
