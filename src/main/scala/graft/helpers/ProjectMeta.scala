package graft.helpers

/** Project / environment introspection.
  *
  * Reference: helpers/python.py:956-1079 — `dump_environment_requirements`
  * (pip-freeze snapshot for reproducibility) and
  * `parse_pyproject_metadata` (project name/version for run logs).
  * JVM-first equivalents: the dependency snapshot lists classpath jars,
  * and project metadata parses a TOML build descriptor with the same
  * key layout.
  */
object ProjectMeta {

  case class Metadata(
      name: Option[String],
      version: Option[String],
      description: Option[String],
      requiresPython: Option[String])

  /** Parse `[project]` metadata from a pyproject.toml-shaped file
    * (python.py:1020-1079). */
  def parsePyprojectMetadata(path: String): Metadata = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    val parsed = graft.config.LoadConfig.parseString(text, "toml")
    val project = parsed.get("project") match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _ => Map.empty[String, Any]
    }
    def str(k: String) = project.get(k).map(_.toString)
    Metadata(str("name"), str("version"), str("description"),
      str("requires-python"))
  }

  /** Snapshot the runtime dependency set for reproducibility — the
    * JVM analogue of `pip freeze > requirements.txt`: sorted classpath
    * jar names plus JVM/Scala versions, written to `path`. */
  def dumpEnvironmentRequirements(path: String): Seq[String] = {
    val jars = System.getProperty("java.class.path", "")
      .split(java.io.File.pathSeparatorChar)
      .filter(_.endsWith(".jar"))
      .map(p => new java.io.File(p).getName)
      .distinct.sorted.toSeq
    val header = Seq(
      s"# java ${System.getProperty("java.version")}",
      s"# scala ${scala.util.Properties.versionNumberString}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      (header ++ jars).mkString("\n") + "\n")
    jars
  }
}
