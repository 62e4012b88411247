package graft.helpers

import java.time.{LocalDate, LocalDateTime, LocalTime, YearMonth}
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date utilities.
  *
  * Reference semantics: helpers/python.py:251-313
  * (`convert_date_strings_to_datetimes`) and the month-handling family
  * around it — flexible date-string parsing where a month-year input
  * snaps the END of a range to the last moment of that month, so date
  * filters are inclusive of the whole period the user named.
  */
object Dates {

  private def fmt(pattern: String): DateTimeFormatter =
    new DateTimeFormatterBuilder()
      .parseCaseInsensitive()
      .appendPattern(pattern)
      .toFormatter(Locale.ENGLISH)

  /** Formats that denote a whole month (no day component) — matching
    * the reference's year_month_formats list (python.py:279-292). */
  private val yearMonthFormats = Seq(
    "MMMM yyyy",  // January 2020
    "MMM yyyy",   // Jan 2020
    "yyyy MMMM",  // 2020 January
    "yyyy MMM",   // 2020 Jan
    "MM-yyyy",    // 01-2020
    "M-yyyy",     // 1-2020
    "MM yyyy",    // 01 2020
    "M yyyy",     // 1 2020
  ).map(fmt)

  private val dateFormats = Seq(
    "yyyy-MM-dd", "yyyy/MM/dd", "dd MMM yyyy", "dd MMMM yyyy",
    "MMM dd yyyy", "MMMM dd yyyy", "dd-MM-yyyy", "yyyy-MM",
  ).map(fmt)

  /** True when the string parses as a month-year (whole-month) form. */
  def isYearMonthString(s: String): Boolean =
    yearMonthFormats.exists(f =>
      scala.util.Try(YearMonth.parse(s.trim, f)).isSuccess)

  /** Parse a flexible date-ish string to a LocalDate (day = 1 for
    * month-year forms). Throws IllegalArgumentException when nothing
    * matches. */
  def parseDate(s: String): LocalDate = {
    val t = s.trim
    yearMonthFormats.view
      .flatMap(f => scala.util.Try(YearMonth.parse(t, f).atDay(1)).toOption)
      .headOption
      .orElse(dateFormats.view.flatMap { f =>
        scala.util.Try(LocalDate.parse(t, f)).toOption
          .orElse(scala.util.Try(YearMonth.parse(t, f).atDay(1)).toOption)
      }.headOption)
      .orElse(scala.util.Try(LocalDateTime.parse(t).toLocalDate).toOption)
      .getOrElse(throw new IllegalArgumentException(
        s"Dates.parseDate: cannot parse '$s'"))
  }

  /** Reference convert_date_strings_to_datetimes: start at its day
    * start; end snapped to month end when a month-year form, then to
    * the last moment of the day — so `("2020-01-15", "Feb 2020")`
    * covers 2020-01-15T00:00 .. 2020-02-29T23:59:59.999999.
    */
  def toInclusiveRange(startDate: String, endDate: String): (LocalDateTime, LocalDateTime) = {
    val start = parseDate(startDate).atStartOfDay()
    val endDay =
      if (isYearMonthString(endDate)) {
        val d = parseDate(endDate)
        YearMonth.from(d).atEndOfMonth()
      } else parseDate(endDate)
    (start, endDay.atTime(LocalTime.of(23, 59, 59, 999999000)))
  }

  // ------------------------------------------------- Column variants
  // Distributed forms of the same calendar arithmetic — pure Catalyst
  // date expressions, codegen'd, no UDFs.

  /** Snap to the last day of the month. */
  def monthEnd(c: Column): Column = last_day(c)

  /** Snap to the first day of the month. */
  def monthStart(c: Column): Column = trunc(c, "month")

  /** Snap to the first day of the quarter / year. */
  def quarterStart(c: Column): Column = trunc(c, "quarter")
  def yearStart(c: Column): Column = trunc(c, "year")

  /** Last moment (23:59:59.999999) of the day — for inclusive
    * end-of-range timestamp filters. */
  def endOfDay(c: Column): Column =
    date_add(c.cast("date"), 1).cast("timestamp") - expr("INTERVAL 1 MICROSECOND")

  /** Whole-period containment test: ts within the month of `period`. */
  def inSameMonth(ts: Column, period: Column): Column =
    trunc(ts.cast("date"), "month") === trunc(period.cast("date"), "month")
}
