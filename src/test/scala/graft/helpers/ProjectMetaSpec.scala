package graft.helpers

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class ProjectMetaSpec extends AnyFunSuite {

  test("parsePyprojectMetadata reads the [project] table") {
    val p = Files.createTempFile("graft_pyproject", ".toml")
    Files.writeString(p,
      """[project]
        |name = "my-pipeline"
        |version = "0.17.0"
        |description = "demo"
        |requires-python = ">=3.9"
        |[tool.other]
        |x = 1
        |""".stripMargin)
    val m = ProjectMeta.parsePyprojectMetadata(p.toString)
    assert(m.name.contains("my-pipeline"))
    assert(m.version.contains("0.17.0"))
    assert(m.requiresPython.contains(">=3.9"))
  }

  test("parsePyprojectMetadata tolerates missing project table") {
    val p = Files.createTempFile("graft_pyproject2", ".toml")
    Files.writeString(p, "[tool.x]\nk = 1\n")
    val m = ProjectMeta.parsePyprojectMetadata(p.toString)
    assert(m.name.isEmpty && m.version.isEmpty)
  }

  test("dumpEnvironmentRequirements writes sorted jar snapshot") {
    val out = Files.createTempFile("graft_reqs", ".txt").toString
    val jars = ProjectMeta.dumpEnvironmentRequirements(out)
    val content = Files.readString(java.nio.file.Paths.get(out))
    assert(content.startsWith("# java "))
    assert(jars.contains("spark-sql_2.13-4.1.2.jar"))
    assert(jars == jars.sorted)
  }
}
