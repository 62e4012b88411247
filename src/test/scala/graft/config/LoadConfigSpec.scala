package graft.config

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ConfigError

class LoadConfigSpec extends AnyFunSuite {

  private def write(suffix: String, content: String): String = {
    val p = Files.createTempFile("graft_cfg", s".$suffix")
    Files.writeString(p, content)
    p.toString
  }

  test("parses json, yaml and toml by suffix") {
    val json = new LoadConfig(write("json", """{"a": {"x": 1}, "b": "two"}"""))
    assert(json.section("a") == Map("x" -> 1L))
    assert(json.get("b").contains("two"))

    val yaml = new LoadConfig(write("yaml", "a:\n  x: 1\nb: two\n"))
    assert(yaml.section("a") == Map("x" -> 1L))

    val toml = new LoadConfig(write("toml",
      "b = \"two\"\n[a]\nx = 1\nflag = true\nvals = [1, 2]\n"))
    assert(toml.section("a") == Map("x" -> 1L, "flag" -> true, "vals" -> List(1L, 2L)))
    assert(toml.get("b").contains("two"))
  }

  test("scheme-qualified paths load via the Hadoop FileSystem API") {
    // file:// is the scheme the suite can exercise hermetically; the
    // same branch serves s3a:// gs:// hdfs:// through FileSystem
    val json = new LoadConfig("file://" + write("json", """{"a": {"x": 1}}"""))
    assert(json.section("a") == Map("x" -> 1L))
    val toml = new LoadConfig("file://" + write("toml", "[a]\nx = 1\n"))
    assert(toml.section("a") == Map("x" -> 1L))
  }

  test("unsupported suffix raises ConfigError") {
    assertThrows[ConfigError](new LoadConfig(write("ini", "a=1")))
  }

  test("overrides merge recursively; unknown keys raise") {
    val path = write("json", """{"a": {"x": 1, "y": 2}, "b": 3}""")
    val cfg = new LoadConfig(path, overrides = Map("a" -> Map("x" -> 9L)))
    assert(cfg.section("a") == Map("x" -> 9L, "y" -> 2L))
    assert(cfg.configOriginal("a") == Map("x" -> 1L, "y" -> 2L))
    assertThrows[ConfigError](
      new LoadConfig(path, overrides = Map("zz" -> 1)))
  }

  test("map-over-scalar override keeps base value (reference rule)") {
    val merged = LoadConfig.overwriteDictionary(
      Map("k" -> 1L), Map("k" -> Map("nested" -> 2L)))
    assert(merged == Map("k" -> 1L))
  }

  test("section accessor errors on missing or scalar sections") {
    val cfg = new LoadConfig(write("json", """{"a": 1}"""))
    assertThrows[ConfigError](cfg.section("a"))
    assertThrows[ConfigError](cfg.section("missing"))
  }

  test("validators run per section; failures propagate") {
    val path = write("json", """{"dates": {"start": "2024-01-01"}}""")
    // passing validator
    new LoadConfig(path, validators = Map("dates" -> { s =>
      Validation.allowedDateFormat(s("start").toString): Unit
    }))
    // failing validator
    val bad = write("json", """{"dates": {"start": "not a date"}}""")
    assertThrows[ConfigError](
      new LoadConfig(bad, validators = Map("dates" -> { s =>
        Validation.allowedDateFormat(s("start").toString): Unit
      })))
  }

  test("toml dotted sections nest") {
    val cfg = new LoadConfig(write("toml", "[outer.inner]\nk = \"v\"\n"))
    assert(cfg.section("outer") == Map("inner" -> Map("k" -> "v")))
  }

  test("a colon in a local relative path does not misroute to Hadoop") {
    // "v1:conf.yaml" URI-parses with scheme "v1" — routing on the
    // parsed scheme would fail with no-filesystem-for-scheme; only an
    // explicit "://" may route remotely
    val dir = java.nio.file.Files.createTempDirectory("cfg")
    val f = dir.resolve("v1:conf.yaml")
    java.nio.file.Files.writeString(f, "a: 1\n")
    val old = System.getProperty("user.dir")
    val got = LoadConfig.parseFile(f.toString) // absolute, colon inside
    assert(got == Map("a" -> 1))
  }

  test("'://'-rule edges: scheme-relative stays local, file:relative fails loudly") {
    // "//dir/path" (scheme-relative URI shape) has no "://" → it is a
    // LOCAL path, and POSIX resolves the doubled slash — the rule must
    // not misroute it to a hostless Hadoop URI
    val dir = java.nio.file.Files.createTempDirectory("cfg2")
    java.nio.file.Files.writeString(dir.resolve("c.yaml"), "b: 2\n")
    assert(LoadConfig.parseFile(s"/$dir/c.yaml") == Map("b" -> 2))
    // "file:c.yaml" (scheme, no slashes) also has no "://" → local
    // path named "file:c.yaml", which does not exist → a loud
    // file-not-found naming the literal path, never a silent misparse
    val ex = intercept[java.nio.file.NoSuchFileException](
      LoadConfig.parseFile("file:c.yaml"))
    assert(ex.getMessage.contains("file:c.yaml"))
  }
}
