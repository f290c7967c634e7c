package graft

import graft.functions.{EclFunctions, Fnv1a}
import org.apache.spark.sql.functions._

/** FNV-1a test vectors (public reference values) + codegen path. */
class Fnv1aSpec extends SparkSpec {

  test("fnv1a32 known vectors") {
    assert(Fnv1a.hash32("".getBytes("UTF-8")) == 0x811c9dc5)
    assert(Fnv1a.hash32("a".getBytes("UTF-8")) == 0xe40c292c)
    assert(Fnv1a.hash32("foobar".getBytes("UTF-8")) == 0xbf9cf968)
  }

  test("fnv1a64 known vectors") {
    assert(Fnv1a.hash64("".getBytes("UTF-8")) == 0xcbf29ce484222325L)
    assert(Fnv1a.hash64("a".getBytes("UTF-8")) == 0xaf63dc4c8601ec8cL)
    assert(Fnv1a.hash64("foobar".getBytes("UTF-8")) == 0x85944171f73967e8L)
  }

  test("hash32/hash64 as codegen'd Columns match the direct impl") {
    import spark.implicits._
    val df = Seq("", "a", "foobar", "Hello World").toDF("s")
    val rows = df.select(col("s"), EclFunctions.hash32(col("s")).as("h32"),
      EclFunctions.hash64(col("s")).as("h64")).collect()
    rows.foreach { r =>
      val b = r.getString(0).getBytes("UTF-8")
      assert(r.getInt(1) == Fnv1a.hash32(b))
      assert(r.getLong(2) == Fnv1a.hash64(b))
    }
  }
}
