package graft

import graft.plans.AutoCse
import org.apache.spark.sql.functions._

/** Automatic shared-subplan caching (the TAKsplit/spotGlobalCSE pass). */
class AutoCseSpec extends SparkSpec {

  test("cacheShared materializes a twice-consumed subplan exactly once") {
    spark.catalog.clearCache()
    val agg = Tables.customer(spark, sf)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
    val q = agg.filter(col("n") > 2).unionByName(agg.filter(col("n") <= 2))

    val before = q.collect().map(_.toSeq).toSet
    // analyzer-dedup can split the shared subtree into >1 canonical form;
    // the invariant is that at least one shared subplan gets materialized
    val cached = AutoCse.cacheShared(q)
    assert(cached >= 1)
    // a fresh identical plan now reads the materialized subplan (q's own
    // queryExecution was memoized pre-cache, so rebuild it)
    val agg2 = Tables.customer(spark, sf)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
    val q2 = agg2.filter(col("n") > 2).unionByName(agg2.filter(col("n") <= 2))
    assert(q2.queryExecution.withCachedData.toString.contains("InMemoryRelation"))
    assert(q2.collect().map(_.toSeq).toSet == before)
    // and so does any OTHER query over a canonically-equal subplan
    val other = Tables.customer(spark, sf)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n")))
    assert(other.queryExecution.withCachedData.toString.contains("InMemoryRelation"))
    spark.catalog.clearCache()
  }

  test("cacheSharedReleasable: release() uncaches exactly what was " +
      "registered (these ARE CacheManager entries, unlike checkpoints)") {
    spark.catalog.clearCache()
    val agg = Tables.customer(spark, sf)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
    val q = agg.filter(col("n") > 2).unionByName(agg.filter(col("n") <= 2))
    val (cached, release) = AutoCse.cacheSharedReleasable(q)
    assert(cached >= 1)
    q.collect() // materialize the cache
    val fresh = Tables.customer(spark, sf)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n")))
    assert(fresh.queryExecution.withCachedData.toString
      .contains("InMemoryRelation"))
    release()
    // after release the canonically-equal subplan is NOT served from cache
    val fresh2 = Tables.customer(spark, sf)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n")))
    assert(!fresh2.queryExecution.withCachedData.toString
      .contains("InMemoryRelation"),
      "released subplan still served from cache")
    spark.catalog.clearCache()
  }

  test("cacheShared leaves single-consumer plans alone") {
    spark.catalog.clearCache()
    val q = Tables.orders(spark, sf).groupBy(col("o_orderstatus")).count()
    assert(AutoCse.cacheShared(q) == 0)
    spark.catalog.clearCache()
  }
}
