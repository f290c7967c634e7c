package graft

import graft.functions.{EclFunctions, EclHash}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** HASH32/HASH64 parity with the reference's FNV-1 (`rtl/eclrtl/eclrtl.cpp`
  * APPLY_FNV32/64 + rtlHash32VStr trailing-space trim). Vectors computed
  * independently from the published FNV-1 algorithm (multiply-then-xor,
  * offsets 0x811c9dc5 / 0xcbf29ce484222325, primes 0x1000193 /
  * 0x100000001b3) — NOT FNV-1a.
  */
class EclHashSpec extends SparkSpec {

  private def h32(s: String) = EclHash.hash32Str(UTF8String.fromString(s))
  private def h64(s: String) = EclHash.hash64Str(UTF8String.fromString(s))

  test("hash32 matches FNV-1 reference vectors") {
    assert(h32("") == -2128831035)          // == offset basis 0x811c9dc5
    assert(h32("a") == 84696446)            // 0x050c5d7e (published vector)
    assert(h32("foobar") == 837857890)      // 0x31f0b262
    assert(h32("hello world") == 1418570095)
    assert(h32("ALGERIA") == -211483386)
    assert(h32("abc") == 1134309195)
  }

  test("hash64 matches FNV-1 reference vectors") {
    assert(h64("") == -3750763034362895579L) // 0xcbf29ce484222325
    assert(h64("a") == -5808590958014384194L)
    assert(h64("foobar") == 3750802935296928194L)
    assert(h64("hello world") == 9065573210506989167L)
    assert(h64("ALGERIA") == -6663346269641565690L)
  }

  test("string hashes trim trailing spaces (rtlTrimVStrLen) but not leading") {
    assert(h32("abc   ") == h32("abc"))
    assert(h64("abc   ") == h64("abc"))
    assert(h32("   abc") != h32("abc"))
    assert(h32("a b") != h32("ab"))
  }

  test("column path hashes through codegen identically to the scalar path") {
    import spark.implicits._
    val names = Seq("ALGERIA", "UNITED STATES", "x  ", "")
    val got = names.toDF("s")
      .select(EclFunctions.hash32(col("s")), EclFunctions.hash64(col("s")))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq == names.map(s => (h32(s), h64(s))).toSeq)
  }

  test("SQL registration casts non-string args instead of crashing") {
    graft.functions.Register.all(spark)
    val r = spark.sql("SELECT ecl_hash32(42) AS a, ecl_hash64(42) AS b").head()
    assert(r.getInt(0) == h32("42"))
    assert(r.getLong(1) == h64("42"))
  }
}
