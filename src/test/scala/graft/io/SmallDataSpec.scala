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

  test("readExcel documents the honest unsupported gap") {
    val e = intercept[UnsupportedOperationException](
      SmallData.readExcel(spark, "/nope.xlsx"))
    assert(e.getMessage.contains("CSV"))
  }
}
