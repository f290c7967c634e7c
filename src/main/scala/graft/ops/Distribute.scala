package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DISTRIBUTE / PARTITION — the reference's explicit MPP repartitioning
  * (SURVEY §2.9; TAKhashdistribute :905, helper :1959; Thor impl
  * `thorlcr/activities/hashdistrib/thhashdistribslave.cpp:80`).
  *
  * In Spark, repartitioning is the shuffle itself; these wrappers exist so
  * engine code states *why* data moves. LOCAL ops then run per-partition
  * with no further movement — the planner property the reference compiles
  * into every activity (SURVEY §2.9 LOCAL) is Spark's `Distribution` /
  * `EnsureRequirements` machinery.
  */
object Distribute {

  /** DISTRIBUTE(ds, HASH(keys)) — hash repartition. */
  def byHash(df: DataFrame, keys: Seq[Column], n: Option[Int] = None): DataFrame =
    n.map(df.repartition(_, keys: _*)).getOrElse(df.repartition(keys: _*))

  /** DISTRIBUTE(ds, skew) — skew-bounded random redistribution. */
  def roundRobin(df: DataFrame, n: Int): DataFrame = df.repartition(n)

  /** DISTRIBUTE(ds, index) / keyed distribute (TAKkeyeddistribute :940):
    * range partition by the key's value distribution (Spark samples the
    * data, the reference uses the index's split points — same effect).
    */
  def byRange(df: DataFrame, keys: Seq[Column]): DataFrame =
    df.repartitionByRange(keys: _*)

  /** DISTRIBUTE(ds, HASH(k), MERGE(sortKeys)) (TAKhashdistributemerge :1032):
    * repartition preserving per-partition sort order.
    */
  def byHashMerge(df: DataFrame, keys: Seq[Column],
      sortKeys: Seq[Column]): DataFrame =
    df.repartition(keys: _*).sortWithinPartitions(sortKeys: _*)

  /** NWAYDISTRIBUTE (TAKnwaydistribute :1086, helper `include(row,
    * targetNode)` :1974): predicate-routed distribution — each row goes to
    * the partition(s) named by `targetExpr` (0-based). Needs an exact
    * partitioner (hash repartition would scramble the mapping), so this is
    * one of the few RDD drops. With `replicateAll` (SDFisall :1969) every
    * row goes to ALL partitions.
    */
  def nwayRouted(df: DataFrame, targetExpr: Column, numPartitions: Int,
      replicateAll: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    val withTarget =
      if (replicateAll)
        df.withColumn("__t", explode(sequence(lit(0), lit(numPartitions - 1))))
      else
        df.withColumn("__t", pmod(targetExpr.cast("int"), lit(numPartitions)))
    val nParts = numPartitions
    val routed = withTarget.rdd
      .map(r => (r.getInt(r.fieldIndex("__t")), r))
      .partitionBy(new org.apache.spark.Partitioner {
        def numPartitions: Int = nParts
        def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .map(_._2)
    spark.createDataFrame(routed, withTarget.schema).drop("__t")
  }

  /** Salt a skewed key: append a random-ish but DETERMINISTIC salt derived
    * from other columns, spreading hot keys over `buckets` partitions.
    * Join the salted fact against a salt-exploded dimension.
    */
  def salted(df: DataFrame, key: Column, saltFrom: Column, buckets: Int,
      as: String): DataFrame =
    df.withColumn(as, concat(key.cast("string"), lit("#"),
      (pmod(hash(saltFrom), lit(buckets))).cast("string")))
}
