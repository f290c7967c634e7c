package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed co-located tables — the Spark-native form of the reference's
  * keyed DISTRIBUTE + local SORT + local JOIN pattern (Thor's
  * hash-distributed files carry a distribution so a later join on the
  * same key runs with no redistribution; `SURVEY §2.9` keyed distribute,
  * `thorlcr` local joins). In Spark the durable analog is a bucketed,
  * per-bucket-sorted table: `bucketBy(n, key).sortBy(key)` persists
  * Murmur3(key) pmod n routing in the table metadata, and a join of two
  * tables bucketed the same way plans with ZERO Exchange — the shuffle
  * happened once at write time and is amortized over every subsequent
  * join, the pattern that matters when the same 100 TB fact table joins
  * daily.
  *
  * Writer detail: rows are `repartition(n, key)`-ed first — Spark's
  * repartition hash IS the bucket hash, so each bucket lands in exactly
  * one task and produces ONE file; single-file buckets let the reader
  * trust the per-bucket sort order (multi-file buckets force a re-sort).
  */
object Bucketed {

  /** Persist `df` as a bucketed, per-bucket-sorted external table at
    * `path`, registered as `name` (replacing any prior registration).
    */
  def writeBucketed(df: DataFrame, name: String, key: String, buckets: Int,
      path: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(name)
  }

  /** Read a bucketed table back (bucket metadata intact). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Co-located merge join of two same-bucketed tables: no Exchange in
    * the plan. The `merge` hint pins SortMergeJoin so the zero-shuffle
    * contract is deterministic rather than threshold-dependent.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).hint("merge")
      .join(spark.table(right), key)
}
