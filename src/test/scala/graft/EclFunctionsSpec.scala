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

  test("Crypto digests match the published FIPS 180 test vectors") {
    import graft.functions.Crypto._
    val abc = lit("abc")
    assert(one(md5Hex(abc)) == "900150983cd24fb0d6963f7d28e17f72")
    assert(one(sha1Hex(abc)) == "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(one(sha2Hex(abc, 224)) ==
      "23097d223405d8228642a477bda255b32aadbce4bda0b3f7e36c9da7")
    assert(one(sha2Hex(abc, 256)) ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(one(sha2Hex(abc, 384)) ==
      "cb00753f45a35e8bb5a03d699ac65007272c32ab0eded1631a8b605a43ff5bed" +
      "8086072ba1e7cc2358baeca134c825a7")
    assert(one(sha2Hex(abc, 512)) ==
      "ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b55d39a" +
      "2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f")
    // empty-string MD5 (RFC 1321 appendix)
    assert(one(md5Hex(lit(""))) == "d41d8cd98f00b204e9800998ecf8427e")
    intercept[IllegalArgumentException] { sha2Hex(abc, 123) }
  }

  test("Crypto AES roundtrip and crc32 over a distributed column") {
    import graft.functions.Crypto._
    val df = Seq("alpha", "beta", "", "unicode: ü🦆").toDF("s").repartition(3)
    val key = lit("0123456789abcdef0123456789abcdef") // 32B → AES-256
    val rt = df.select(col("s"),
      aesDecrypt(aesEncrypt(col("s"), key), key).as("rt"),
      crc32Of(col("s")).as("c"))
    assert(rt.collect().forall(r => r.getString(0) == r.getString(1)))
    // crc32("") == 0; known vector crc32("123456789") == 0xCBF43926
    assert(Seq("123456789").toDF("s")
      .select(crc32Of(col("s"))).head.getLong(0) == 0xCBF43926L)
  }
}
