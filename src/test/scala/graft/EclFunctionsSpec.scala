package graft

import graft.functions.EclFunctions._
import org.apache.spark.sql.functions._

/** ECL semantics layer: padding, 1-based inclusive substring, trailing-
  * space-blind compare, Date_t codecs (SURVEY §7.4 hard cases).
  */
class EclFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String =
    Seq("x").toDF("d").select(c.cast("string")).head.getString(0)

  test("eclSubstring is 1-based inclusive and right-pads to width") {
    val df = Seq("hello").toDF("s")
    assert(df.select(eclSubstring(col("s"), 2, 4)).head.getString(0) == "ell")
    // out-of-range reads as spaces
    assert(df.select(eclSubstring(col("s"), 4, 8)).head.getString(0) == "lo   ")
  }

  test("toFixedString pads/truncates like STRING[n] cast") {
    val df = Seq(("ab", "abcdef")).toDF("a", "b")
    assert(df.select(toFixedString(col("a"), 4)).head.getString(0) == "ab  ")
    assert(df.select(toFixedString(col("b"), 4)).head.getString(0) == "abcd")
  }

  test("eclStrEq ignores trailing spaces (rtlCompareStrStr)") {
    val df = Seq(("abc   ", "abc")).toDF("a", "b")
    assert(df.select(eclStrEq(col("a"), col("b"))).head.getBoolean(0))
    val df2 = Seq(("  abc", "abc")).toDF("a", "b")
    assert(!df2.select(eclStrEq(col("a"), col("b"))).head.getBoolean(0))
  }

  test("cleanSpaces collapses whitespace") {
    val df = Seq("  a   b\t c  ").toDF("s")
    assert(df.select(cleanSpaces(col("s"))).head.getString(0) == "a b c")
  }

  test("Date_t codec roundtrip + arithmetic") {
    val df = Seq("1995-03-17").toDF("d")
      .select(to_date(col("d")).as("d"))
    assert(df.select(toDateT(col("d"))).head.getInt(0) == 19950317)
    assert(df.select(fromDateT(toDateT(col("d")))).head.getDate(0).toString
      == "1995-03-17")
    val dd = Seq((19950101, 19950301)).toDF("a", "b")
    assert(dd.select(daysBetweenT(col("a"), col("b"))).head.getInt(0) == 59)
  }

  test("isLeapYear matches the Gregorian rule") {
    val df = Seq(2000, 1900, 2024, 2023).toDF("y")
    assert(df.select(isLeapYear(col("y"))).collect().map(_.getBoolean(0)).toSeq
      == Seq(true, false, true, false))
  }

  test("findCount counts literal (regex-quoted) occurrences") {
    val df = Seq("a.a.a").toDF("s")
    assert(df.select(findCount(col("s"), ".")).head.getInt(0) == 2)
    assert(df.select(findCount(col("s"), "a")).head.getInt(0) == 3)
  }

  test("SQL registration exposes the ECL layer to spark.sql") {
    graft.functions.Register.all(spark)
    val r = spark.sql(
      "SELECT ecl_hash32('foobar') AS h32, ecl_hash64('a') AS h64, " +
      "ecl_clean_spaces('  a   b ') AS cs, " +
      "ecl_date_t(DATE'1995-03-17') AS dt").head
    // FNV-1 (reference APPLY_FNV32/64), not FNV-1a
    assert(r.getInt(0) == 0x31f0b262)
    assert(r.getLong(1) == 0xaf63bd4c8601b7beL)
    assert(r.getString(2) == "a b")
    assert(r.getInt(3) == 19950317)
  }
}
