package graft.config

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import graft.ConfigError

/** Config loading (json / yaml / toml by file suffix) with strict
  * override-merge, mirroring the reference's `LoadConfig`
  * (reference: rdsa_utils/io/config.py:21-191) and the
  * `overwrite_dictionary` merge rules
  * (reference: rdsa_utils/helpers/python.py:114-212):
  *   - nested dict override merges recursively;
  *   - unknown key → ConfigError;
  *   - dict-over-scalar keeps the base value (with a warning).
  *
  * Values are plain Scala: Map[String, Any] sections, List[Any] arrays,
  * String/Long/Double/Boolean scalars — the reference is schema-dynamic,
  * so a case-class model would fight its semantics.
  */
class LoadConfig(
    val configPath: String,
    overrides: Map[String, Any] = Map.empty,
    validators: Map[String, Map[String, Any] => Unit] = Map.empty,
) {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Parsed config before overrides — kept like the reference's
    * `config_original`. */
  val configOriginal: Map[String, Any] = LoadConfig.parseFile(configPath)

  /** Post-override, post-validation config. */
  val config: Map[String, Any] = {
    val merged = LoadConfig.overwriteDictionary(configOriginal, overrides)
    merged.foreach {
      case (section, value: Map[_, _]) =>
        validators.get(section).foreach { v =>
          v(value.asInstanceOf[Map[String, Any]])
        }
      case (section, _) =>
        if (validators.contains(section))
          log.warn(s"validator for '$section' skipped: section is not a mapping")
    }
    merged
  }

  def section(name: String): Map[String, Any] = config.get(name) match {
    case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
    case Some(other) =>
      throw new ConfigError(s"section '$name' is not a mapping: $other")
    case None => throw new ConfigError(s"section '$name' not present in config")
  }

  def get(name: String): Option[Any] = config.get(name)
}

object LoadConfig {

  /** Parse a config file by suffix. A bare path reads the local
    * filesystem; a path with a scheme (`file://`, `s3a://`, `gs://`,
    * `hdfs://`, …) routes through the Hadoop FileSystem API — the
    * analogue of the reference accepting a CloudPath
    * (rdsa_utils/io/config.py:50) and `load_config_gcp`
    * (gcp/helpers/gcp_utils.py:72) reading configs from a bucket, so
    * configs can live next to the data they describe. */
  def parseFile(path: String): Map[String, Any] = {
    // only an explicit "scheme://" routes remotely: a bare URI-parse
    // scheme check would misroute local relative paths with a colon in
    // the first segment ("v1:conf.yaml") and Windows drive paths into
    // the Hadoop FileSystem and fail with an obscure
    // no-filesystem-for-scheme error
    val remote = path.contains("://")
    val text =
      if (!remote)
        new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
          java.nio.charset.StandardCharsets.UTF_8)
      else {
        val conf = org.apache.spark.sql.SparkSession.getActiveSession
          .map(_.sessionState.newHadoopConf())
          .getOrElse(new org.apache.hadoop.conf.Configuration())
        val p = new org.apache.hadoop.fs.Path(path)
        val in = p.getFileSystem(conf).open(p)
        try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      }
    val suffix = path.substring(path.lastIndexOf('.') + 1).toLowerCase
    parseString(text, suffix)
  }

  def parseString(text: String, format: String): Map[String, Any] = format match {
    case "json"         => fromJackson(new ObjectMapper().readValue(text, classOf[java.util.Map[String, Object]]))
    case "yaml" | "yml" => fromJackson(new ObjectMapper(new YAMLFactory()).readValue(text, classOf[java.util.Map[String, Object]]))
    case "toml"         => Toml.parse(text)
    case other          => throw new ConfigError(s"unsupported config format: .$other")
  }

  private def fromJackson(v: Any): Map[String, Any] = convert(v).asInstanceOf[Map[String, Any]]

  private def convert(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => k.toString -> convert(vv) }.toMap
    case l: java.util.List[_] => l.asScala.map(convert).toList
    case i: java.lang.Integer => i.longValue()
    case other                => other
  }

  /** Strict recursive override-merge (reference
    * rdsa_utils/helpers/python.py:114-212): unknown keys raise; nested
    * maps merge; a map overriding a scalar is ignored with a warning.
    */
  def overwriteDictionary(
      base: Map[String, Any],
      overrides: Map[String, Any]): Map[String, Any] = {
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    overrides.foldLeft(base) { case (acc, (k, v)) =>
      (acc.get(k), v) match {
        case (None, _) =>
          throw new ConfigError(s"override key '$k' not present in base config")
        case (Some(bm: Map[_, _]), om: Map[_, _]) =>
          acc.updated(k, overwriteDictionary(
            bm.asInstanceOf[Map[String, Any]], om.asInstanceOf[Map[String, Any]]))
        case (Some(scalar), _: Map[_, _]) =>
          log.warn(s"override for '$k' is a mapping but base is scalar ($scalar); keeping base")
          acc
        case (Some(_), other) => acc.updated(k, other)
      }
    }
  }
}

/** Minimal TOML subset parser: [section] headers, key = value with
  * strings, ints, floats, booleans and flat arrays — exactly the shapes
  * the reference's config fixtures use (tests/io/conftest.py:10-91).
  */
private[config] object Toml {
  def parse(text: String): Map[String, Any] = {
    var result = Map.empty[String, Any]
    var current: Option[String] = None
    var section = Map.empty[String, Any]
    def flush(): Unit = current.foreach { name =>
      // support dotted section names a.b -> nested maps
      val parts = name.split('.')
      def nest(path: List[String], into: Map[String, Any]): Map[String, Any] =
        path match {
          case last :: Nil => into.updated(last, section)
          case head :: rest =>
            val child = into.get(head) match {
              case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
              case _                  => Map.empty[String, Any]
            }
            into.updated(head, nest(rest, child))
          case Nil => into
        }
      result = nest(parts.toList, result)
    }
    text.linesIterator.map(stripComment).map(_.trim).filter(_.nonEmpty).foreach { line =>
      if (line.startsWith("[") && line.endsWith("]")) {
        flush()
        current = Some(line.substring(1, line.length - 1).trim)
        section = Map.empty
      } else {
        val idx = line.indexOf('=')
        if (idx < 0) throw new graft.ConfigError(s"TOML parse error at: $line")
        val k = stripQuotes(line.substring(0, idx).trim)
        val v = parseValue(line.substring(idx + 1).trim)
        if (current.isDefined) section = section.updated(k, v)
        else result = result.updated(k, v)
      }
    }
    flush()
    result
  }

  private def stripComment(line: String): String = {
    // naive but fine for config fixtures: drop # outside quotes
    var inStr = false
    val sb = new StringBuilder
    for (c <- line) {
      if (c == '"') inStr = !inStr
      if (c == '#' && !inStr) return sb.toString
      sb.append(c)
    }
    sb.toString
  }

  private def stripQuotes(s: String): String =
    if (s.length >= 2 && s.startsWith("\"") && s.endsWith("\"")) s.substring(1, s.length - 1)
    else s

  def parseValue(s: String): Any = s match {
    case "true"  => true
    case "false" => false
    case v if v.startsWith("\"") => stripQuotes(v)
    case v if v.startsWith("[") && v.endsWith("]") =>
      val inner = v.substring(1, v.length - 1).trim
      if (inner.isEmpty) List.empty[Any]
      else inner.split(',').map(x => parseValue(x.trim)).toList
    case v =>
      try java.lang.Long.parseLong(v)
      catch {
        case _: NumberFormatException =>
          try java.lang.Double.parseDouble(v)
          catch { case _: NumberFormatException => v }
      }
  }
}
