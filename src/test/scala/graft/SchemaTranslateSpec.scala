package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-on-read translation (`Sources.readTranslated` — the
  * rtldynfield analog): name-based alignment, widening casts, ECL
  * defaults for missing fields (0/''/false, never null), dropped fields,
  * and the plan contract (per-part projections still prune/push into the
  * scans).
  */
class SchemaTranslateSpec extends SparkSpec {
  import spark.implicits._

  private val base = s"target/graft_io/schema_translate/${System.nanoTime()}"

  test("widening + missing-field defaults + dropped fields, by name") {
    Seq((1, "a"), (2, "b")).toDF("k", "s")
      .select(col("k").cast("int").as("k"), col("s"), lit(9).as("retired"))
      .write.parquet(s"$base/v1")
    Seq((3L, "c", 7.5, true)).toDF("k", "s", "score", "ok")
      .write.parquet(s"$base/v2")
    val expected = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType),
      StructField("score", DoubleType), StructField("ok", BooleanType)))
    val got = Sources.readTranslated(spark, Seq(s"$base/v1", s"$base/v2"), expected)
      .orderBy(col("k")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))
    // v1 rows: score defaults to 0.0 and ok to false (ECL defaults, not null)
    assert(got.toSeq == Seq((1L, "a", 0.0, false), (2L, "b", 0.0, false),
      (3L, "c", 7.5, true)))
  }

  test("column order in the file does not matter — alignment is by name") {
    Seq(("x", 1L)).toDF("s", "k").write.parquet(s"$base/reordered")
    val expected = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType)))
    val row = Sources.readTranslated(spark, Seq(s"$base/reordered"), expected)
      .collect().head
    assert(row.getLong(0) == 1L && row.getString(1) == "x")
  }

  test("translated parts still push filters into their scans") {
    Seq((1, "a"), (50, "b")).toDF("k", "s")
      .select(col("k").cast("int").as("k"), col("s"))
      .write.parquet(s"$base/push1")
    Seq((60L, "c")).toDF("k", "s").write.parquet(s"$base/push2")
    val expected = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType)))
    val df = Sources.readTranslated(spark, Seq(s"$base/push1", s"$base/push2"),
      expected).filter(col("k") > 10)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the narrow part's scan sees the filter against its OWN int type
    assert(plan.contains("PushedFilters: [IsNotNull(k)"),
      s"filter did not reach the scans:\n$plan")
    assert(df.count() == 2)
  }
}
