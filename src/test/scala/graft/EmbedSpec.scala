package graft

import graft.functions.Embed
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** EMBED(python) streamed row transform (plugins/py3embed analog): the
  * q233 oracle gate certifies end-to-end parity on orders; these specs pin
  * the contract corners the gate can't isolate — the None→SKIP drop path,
  * unicode surviving the JSON boundary, declared-schema discipline, and
  * that the worker runs per PARTITION (multi-partition inputs round-trip
  * whole).
  */
class EmbedSpec extends SparkSpec {

  private val out = StructType(Seq(
    StructField("k", LongType),
    StructField("v", StringType)))

  test("transform maps every row; None drops (SKIP analog)") {
    import spark.implicits._
    val in = (1L to 100L).toDF("k").withColumn("v", concat(lit("row"), col("k")))
    val got = Embed.python(in,
      """|def transform(row):
         |    if row["k"] % 10 == 0:
         |        return None
         |    return {"k": row["k"] * 2, "v": row["v"].upper()}""",
      out)
    val rows = got.orderBy("k").collect()
    assert(rows.length == 90)
    assert(rows.head.getLong(0) == 2 && rows.head.getString(1) == "ROW1")
    assert(rows.forall(r => r.getLong(0) % 20 != 0))
  }

  test("unicode crosses the JSON process boundary intact") {
    import spark.implicits._
    val in = Seq((1L, "héllo wörld"), (2L, "日本語テキスト"), (3L, "emoji 🎯 ok"))
      .toDF("k", "v")
    val got = Embed.python(in,
      """|def transform(row):
         |    return {"k": row["k"], "v": row["v"][::-1]}""",
      out).orderBy("k").collect()
    assert(got(0).getString(1) == "héllo wörld".reverse)
    assert(got(1).getString(1) == "日本語テキスト".reverse)
    // the emoji is a surrogate pair in JVM String — python reverses by
    // codepoint, so compare against a codepoint-reversed expectation
    val cp = "emoji 🎯 ok".codePoints.toArray.reverse
    assert(got(2).getString(1) == new String(cp, 0, cp.length))
  }

  test("multi-partition input: one worker per partition, all rows arrive") {
    import spark.implicits._
    val in = spark.range(0, 10000, 1, 8).toDF("k")
      .withColumn("v", lit("x"))
    val got = Embed.python(in,
      """|def transform(row):
         |    return {"k": row["k"], "v": row["v"]}""",
      out)
    assert(got.count() == 10000)
    assert(got.agg(sum("k")).head.getLong(0) == 10000L * 9999 / 2)
  }

  test("declared schema discipline: wrong-shaped emission surfaces as null, never reshapes") {
    import spark.implicits._
    val in = Seq((1L, "a")).toDF("k", "v")
    val got = Embed.python(in,
      """|def transform(row):
         |    return {"k": row["k"], "unexpected": 42}""",
      out).collect()
    assert(got.length == 1 && got(0).getLong(0) == 1 && got(0).isNullAt(1))
  }
}
