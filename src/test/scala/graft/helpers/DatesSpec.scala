package graft.helpers

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class DatesSpec extends SparkTestBase {
  import spark.implicits._

  test("parseDate handles ISO, month-year and verbose forms") {
    assert(Dates.parseDate("2024-03-15") == LocalDate.of(2024, 3, 15))
    assert(Dates.parseDate("January 2020") == LocalDate.of(2020, 1, 1))
    assert(Dates.parseDate("Jan 2020") == LocalDate.of(2020, 1, 1))
    assert(Dates.parseDate("2020 Jan") == LocalDate.of(2020, 1, 1))
    assert(Dates.parseDate("01-2020") == LocalDate.of(2020, 1, 1))
    assert(Dates.parseDate("15 Mar 2024") == LocalDate.of(2024, 3, 15))
    assert(Dates.parseDate("2020-02") == LocalDate.of(2020, 2, 1))
    assertThrows[IllegalArgumentException](Dates.parseDate("not a date"))
  }

  test("isYearMonthString distinguishes whole-month forms") {
    assert(Dates.isYearMonthString("February 2020"))
    assert(Dates.isYearMonthString("02-2020"))
    assert(!Dates.isYearMonthString("2020-02-15"))
  }

  test("toInclusiveRange snaps month-year end to last moment of month (reference parity)") {
    val (start, end) = Dates.toInclusiveRange("2020-01-15", "Feb 2020")
    assert(start == java.time.LocalDateTime.of(2020, 1, 15, 0, 0))
    assert(end.toLocalDate == LocalDate.of(2020, 2, 29)) // leap year
    assert(end.getHour == 23 && end.getMinute == 59 && end.getSecond == 59)
  }

  test("toInclusiveRange keeps explicit day ends, extended to end of day") {
    val (_, end) = Dates.toInclusiveRange("2020-01-01", "2020-03-10")
    assert(end.toLocalDate == LocalDate.of(2020, 3, 10))
    assert(end.getHour == 23)
  }

  test("Column helpers: monthStart/monthEnd/endOfDay") {
    val d = Seq("2024-02-10").toDF("s").select($"s".cast("date").as("d"))
    val row = d.select(
      Dates.monthStart($"d"), Dates.monthEnd($"d"),
      Dates.quarterStart($"d"), Dates.yearStart($"d"),
      Dates.endOfDay($"d").cast("string")).head()
    assert(row.getDate(0).toString == "2024-02-01")
    assert(row.getDate(1).toString == "2024-02-29")
    assert(row.getDate(2).toString == "2024-01-01")
    assert(row.getDate(3).toString == "2024-01-01")
    assert(row.getString(4).startsWith("2024-02-10 23:59:59"))
  }

  test("inSameMonth") {
    val d = Seq(("2024-02-10", "2024-02-28"), ("2024-02-10", "2024-03-01"))
      .toDF("a", "b")
      .select($"a".cast("timestamp").as("a"), $"b".cast("timestamp").as("b"))
    val got = d.select(Dates.inSameMonth($"a", $"b")).as[Boolean].collect().toSeq
    assert(got == Seq(true, false))
  }
}

class ValidationSpec extends AnyFunSuite {
  import graft.config.Validation

  test("allowedDateFormat accepts parseable dates, rejects junk") {
    assert(Validation.allowedDateFormat("2024-01-01") == "2024-01-01")
    assert(Validation.allowedDateFormat("March 2021") == "March 2021")
    assertThrows[graft.ConfigError](Validation.allowedDateFormat("soon"))
  }

  test("listConvert lifts scalars, passes lists, null → empty") {
    assert(Validation.listConvert("x") == List("x"))
    assert(Validation.listConvert(List(1, 2)) == List(1, 2))
    assert(Validation.listConvert(null) == Nil)
  }

  test("applyValidation warn-passthrough without validator, applies with") {
    val cfg = Map[String, Any]("a" -> 1L)
    assert(Validation.applyValidation(cfg, None) == cfg)
    val upper = (c: Map[String, Any]) => c.map { case (k, v) => k.toUpperCase -> v }
    assert(Validation.applyValidation(cfg, Some(upper)) == Map("A" -> 1L))
  }

  test("require enforces presence") {
    assert(Validation.require(Map[String, Any]("k" -> "v"), "k")(_.toString) == "v")
    assertThrows[graft.ConfigError](
      Validation.require(Map.empty[String, Any], "k")(identity))
  }
}
