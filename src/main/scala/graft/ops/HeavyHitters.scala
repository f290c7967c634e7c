package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** EXACT heavy hitters (frequent items) without ever shuffling the full
  * key domain — the aggregate shape token/URL/entity frequency mining
  * needs when the key cardinality (billions of distinct tokens at 100 TB)
  * would blow a plain groupBy's shuffle and state.
  *
  * Two passes, both bounded:
  *  1. per-partition SpaceSaving (Metwally 2005) with capacity
  *     k > 1/minShare: any item whose GLOBAL share is ≥ minShare has
  *     per-partition share ≥ minShare in at least one partition (the max
  *     partition share is ≥ the weighted mean = global share), and
  *     SpaceSaving guarantees every item with partition count > n_p/k
  *     survives — so the candidate union has NO false negatives. Per
  *     partition only k counters live in memory; the candidate set is
  *     ≤ k × #partitions rows.
  *  2. exact recount: broadcast-semi-filter the corpus to the candidates
  *     and aggregate — partial aggregation compresses map-side, the
  *     shuffle carries only candidate keys. False positives from pass 1
  *     die at the final threshold filter.
  *
  * Output is EXACT (same rows as `GROUP BY key HAVING count >= ceil(n ×
  * minShare)`), which is what the DuckDB oracle checks — the sketch only
  * bounds the candidate generation, never the answer.
  *
  * The reference has no sketch operators; its users run this as a full
  * TABLE aggregate (`TAKgroupaggregate`) — correct but shuffle-bound at
  * the 100 TB token scale this targets.
  */
object HeavyHitters {

  /** Keys of `df.select(key)` whose frequency is ≥ ceil(total × minShare),
    * with exact counts: columns (k: string, cnt: long).
    */
  def heavyHitters(df: DataFrame, key: Column, minShare: Double): DataFrame = {
    require(minShare > 0 && minShare <= 1, s"minShare in (0,1]: $minShare")
    val capacity = math.max(16, (1.0 / minShare).toInt + 2)
    val keyed = df.select(key.cast("string").as("k")).filter(col("k").isNotNull)
    import keyed.sparkSession.implicits._
    val candidates = keyed.as[String].mapPartitions { it =>
      spaceSaving(it, capacity).iterator
    }.toDF("k").distinct()
    val total = keyed.count()
    val threshold = math.ceil(total * minShare).toLong
    keyed
      .join(broadcast(candidates), Seq("k"), "left_semi")
      .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }

  /** SpaceSaving summary of one partition: at most `capacity` keys; every
    * key with true count > n_p/capacity is guaranteed present.
    */
  private[graft] def spaceSaving(it: Iterator[String], capacity: Int): Seq[String] = {
    val counts = mutable.HashMap.empty[String, Long]
    // count → keys at that count, so eviction of the minimum is O(log k)
    // instead of a full scan per miss
    val buckets = new java.util.TreeMap[Long, mutable.HashSet[String]]
    def moveTo(k: String, from: Long, to: Long): Unit = {
      if (from > 0) {
        val s = buckets.get(from)
        s.remove(k)
        if (s.isEmpty) buckets.remove(from)
      }
      buckets.computeIfAbsent(to, _ => mutable.HashSet.empty).add(k)
      counts.update(k, to)
    }
    it.foreach { k =>
      counts.get(k) match {
        case Some(c) => moveTo(k, c, c + 1)
        case None if counts.size < capacity => moveTo(k, 0L, 1L)
        case None =>
          // evict one minimum-count key and inherit its count + 1 (the
          // SpaceSaving overestimate that keeps the guarantee)
          val minEntry = buckets.firstEntry()
          val victim = minEntry.getValue.head
          minEntry.getValue.remove(victim)
          if (minEntry.getValue.isEmpty) buckets.remove(minEntry.getKey)
          counts.remove(victim)
          moveTo(k, 0L, minEntry.getKey + 1)
      }
    }
    counts.keys.toSeq
  }
}
