package graft.config

import graft.ConfigError
import graft.helpers.Dates

/** Config-field validators — the reference's pydantic helper surface
  * (rdsa_utils/validation.py:16-87) re-expressed as composable
  * `Any => Any` checks usable in `LoadConfig` section validators.
  */
object Validation {

  /** Reference allowed_date_format (validation.py:67-87): the string
    * must parse as a date/month; returns it unchanged, else raises. */
  def allowedDateFormat(date: String): String = {
    try { Dates.parseDate(date); date }
    catch {
      case _: IllegalArgumentException =>
        throw new ConfigError(
          s"allowedDateFormat: '$date' is not an accepted date format")
    }
  }

  /** Reference list_convert (python.py / validation.py): lift a scalar
    * to a single-element list, pass lists through, None → empty. */
  def listConvert(v: Any): List[Any] = v match {
    case null          => Nil
    case l: List[_]    => l
    case s: Seq[_]     => s.toList
    case other         => List(other)
  }

  /** Reference apply_validation warn-passthrough: no validator → warn
    * and return the config unchanged (validation.py:16-52). */
  def applyValidation(
      config: Map[String, Any],
      validator: Option[Map[String, Any] => Map[String, Any]]): Map[String, Any] =
    validator match {
      case Some(v) => v(config)
      case None =>
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn("No validator provided, config contents unvalidated.")
        config
    }

  /** Require a key to be present and satisfy a check. */
  def require[T](config: Map[String, Any], key: String)(check: Any => T): T =
    config.get(key) match {
      case Some(v) => check(v)
      case None    => throw new ConfigError(s"required config key '$key' missing")
    }
}
