package graft

import graft.functions.StdDate._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Std.Date pinned to the REFERENCE'S OWN unit tests
  * (`ecllibrary/teststd/Date/TestDate.ecl` constant assertions, ported
  * expression-for-expression): epoch/Gregorian/Julian conversions, part
  * getters, leap rules, between-arithmetic (incl. the monthEndsEqual
  * flag), Sunday-anchored year/month week numbers with every
  * startingDayOfWeek, ISO week dates across the hard year boundaries
  * (2004-W53, 2008/2009 rollover, 2009-W53), and UTC epoch seconds incl.
  * pre-epoch. One evaluated batch per test; each row cites the ECL
  * assertion it mirrors via the expected value.
  */
class DateReferenceVectorsSpec extends SparkSpec {
  import spark.implicits._

  private def evalAll(cases: Seq[(Column, Any)]): Unit = {
    val row = Seq(1).toDF("x")
      .select(cases.map(_._1).zipWithIndex.map { case (c, i) =>
        c.as(s"c$i")
      }: _*).head()
    cases.zipWithIndex.foreach { case ((_, expected), i) =>
      assert(row.get(i) == expected, s"vector $i: got ${row.get(i)}")
    }
  }

  test("epoch, Gregorian and Julian day conversions") {
    evalAll(Seq(
      (fromDaysSince1900(lit(0)), 19000101),
      (toGregorianDate(lit(1)), 10101),
      (toDaysSince1900(dateFromParts(lit(1900), lit(1), lit(1))), 0),
      (toDaysSince1900(dateFromParts(lit(1900), lit(12), lit(1))), 334),
      (toDaysSince1900(dateFromParts(lit(1900), lit(12), lit(31))), 364),
      (fromGregorianDate(dateFromParts(lit(1), lit(1), lit(1))), 1),
      (toJulianDate(lit(1)), 10101),
      (fromJulianYMD(lit(1), lit(1), lit(1)), 1)))
  }

  test("part getters and constructors") {
    evalAll(Seq(
      (yearT(lit(19990201)), 1999),
      (monthT(lit(19990201)), 2),
      (dayT(lit(19990201)), 1),
      (hourT(lit(123456)), 12),
      (minuteT(lit(123456)), 34),
      (secondT(lit(123456)), 56),
      (dateFromParts(lit(1999), lit(2), lit(1)), 19990201),
      (timeFromParts(lit(12), lit(34), lit(56)), 123456)))
  }

  test("leap-year rules (century and Julian divergence)") {
    evalAll(Seq(
      (isLeapYear(lit(1900)), false),
      (isLeapYear(lit(1904)), true),
      (isLeapYear(lit(2100)), false),
      (isLeapYear(lit(2000)), true),
      (isLeapYear(lit(1901)), false),
      (isDateLeapYear(lit(20000201)), true),
      (isDateLeapYear(lit(20010201)), false),
      (isDateLeapYear(lit(21000201)), false),
      (isJulianLeapYear(lit(2000)), true),
      (isJulianLeapYear(lit(2001)), false)))
  }

  test("years/months/days between, incl. monthEndsEqual") {
    evalAll(Seq(
      (yearsBetween(lit(20010615), lit(20020615)), 1),
      (yearsBetween(lit(20010615), lit(20020614)), 0),
      (yearsBetween(lit(20020615), lit(20010615)), -1),
      (monthsBetween(lit(19700101), lit(19701231)), 11),
      (monthsBetween(lit(19701231), lit(19710101)), 0),
      (monthsBetween(lit(19701231), lit(19711231)), 12),
      (monthsBetween(lit(19711231), lit(19701231)), -12),
      (monthsBetween(lit(19700606), lit(19700706)), 1),
      (monthsBetween(lit(19700606), lit(19700705)), 0),
      (monthsBetween(lit(19700606), lit(19700607)), 0),
      (monthsBetween(lit(20160331), lit(20160930)), 5),
      (monthsBetween(lit(20160331), lit(20160930), monthEndsEqual = true), 6),
      (daysBetween(lit(20010615), lit(20020615)), 365),
      (daysBetween(lit(20010615), lit(20020614)), 364),
      (daysBetween(lit(20020615), lit(20010615)), -365)))
  }

  test("year week numbers for every startingDayOfWeek") {
    evalAll(Seq(
      (yearWeekNum(lit(20180101)), 1),
      (yearWeekNum(lit(20180106)), 1),
      (yearWeekNum(lit(20180107)), 2),
      (yearWeekNum(lit(20180107), 2), 1),
      (yearWeekNum(lit(20180108), 2), 2),
      (yearWeekNum(lit(20180101), 3), 1),
      (yearWeekNum(lit(20180102), 3), 2),
      (yearWeekNum(lit(20180102), 4), 1),
      (yearWeekNum(lit(20180103), 4), 2),
      (yearWeekNum(lit(20180103), 5), 1),
      (yearWeekNum(lit(20180104), 5), 2),
      (yearWeekNum(lit(20180104), 6), 1),
      (yearWeekNum(lit(20180105), 6), 2),
      (yearWeekNum(lit(20180105), 7), 1),
      (yearWeekNum(lit(20180106), 7), 2)))
  }

  test("month week numbers for every startingDayOfWeek") {
    evalAll(Seq(
      (monthWeekNum(lit(20180101)), 1),
      (monthWeekNum(lit(20180106)), 1),
      (monthWeekNum(lit(20180107)), 2),
      (monthWeekNum(lit(20180201)), 1),
      (monthWeekNum(lit(20180304), 2), 1),
      (monthWeekNum(lit(20180305), 2), 2),
      (monthWeekNum(lit(20180305), 3), 1),
      (monthWeekNum(lit(20180306), 3), 2),
      (monthWeekNum(lit(20180306), 4), 1),
      (monthWeekNum(lit(20180307), 4), 2),
      (monthWeekNum(lit(20180307), 5), 1),
      (monthWeekNum(lit(20180308), 5), 2),
      (monthWeekNum(lit(20180301), 6), 1),
      (monthWeekNum(lit(20180302), 6), 2),
      (monthWeekNum(lit(20180302), 7), 1),
      (monthWeekNum(lit(20180303), 7), 2)))
  }

  test("ISO day-of-week and extended ISO week dates at year boundaries") {
    evalAll(Seq(
      (isoDayOfWeek(lit(20140130)), 4),
      (isoDayOfWeek(lit(19650217)), 3),
      (isoDayOfWeek(lit(20530213)), 4)))
    evalAll(Seq(
      (isoWeekDate(lit(20050101), extended = true), "2004-W53-6"),
      (isoWeekDate(lit(20050102), extended = true), "2004-W53-7"),
      (isoWeekDate(lit(20051231), extended = true), "2005-W52-6"),
      (isoWeekDate(lit(20060101), extended = true), "2005-W52-7"),
      (isoWeekDate(lit(20060102), extended = true), "2006-W01-1"),
      (isoWeekDate(lit(20061231), extended = true), "2006-W52-7"),
      (isoWeekDate(lit(20070101), extended = true), "2007-W01-1"),
      (isoWeekDate(lit(20071230), extended = true), "2007-W52-7"),
      (isoWeekDate(lit(20071231), extended = true), "2008-W01-1"),
      (isoWeekDate(lit(20080101), extended = true), "2008-W01-2"),
      (isoWeekDate(lit(20081228), extended = true), "2008-W52-7"),
      (isoWeekDate(lit(20081229), extended = true), "2009-W01-1"),
      (isoWeekDate(lit(20081230), extended = true), "2009-W01-2"),
      (isoWeekDate(lit(20081231), extended = true), "2009-W01-3"),
      (isoWeekDate(lit(20090101), extended = true), "2009-W01-4"),
      (isoWeekDate(lit(20091231), extended = true), "2009-W53-4"),
      (isoWeekDate(lit(20100101), extended = true), "2009-W53-5"),
      (isoWeekDate(lit(20100102), extended = true), "2009-W53-6"),
      (isoWeekDate(lit(20100103), extended = true), "2009-W53-7")))
  }

  test("UTC epoch seconds, incl. pre-epoch and roundtrip parts") {
    evalAll(Seq(
      (secondsFromParts(lit(1999), lit(2), lit(1), lit(12), lit(34), lit(56)),
        917872496L),
      (secondsFromParts(lit(1965), lit(2), lit(17), lit(0), lit(0), lit(0)),
        -153705600L),
      (secondsFromParts(lit(2020), lit(3), lit(8), lit(1), lit(0), lit(0)),
        1583629200L),
      (secondsFromParts(lit(2020), lit(3), lit(8), lit(2), lit(0), lit(0)),
        1583632800L),
      (secondsFromParts(lit(2020), lit(3), lit(8), lit(3), lit(0), lit(0)),
        1583636400L),
      (secondsToDateT(lit(917872496L)), 19990201),
      (secondsToTimeT(lit(917872496L)), 123456)))
  }
}
