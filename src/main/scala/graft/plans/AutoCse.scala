package graft.plans

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}

/** Automatic shared-subplan caching — the TAKsplit/CSE planner pass
  * (SURVEY §4.1: the single reference-optimizer capability Catalyst does
  * NOT provide; `spotGlobalCSE` `ecl/hqlcpp/hqlttcpp.cpp:14614`).
  *
  * Catalyst eliminates common *expressions* but recomputes common
  * *subplans*: a DataFrame consumed by two branches of one query (or by
  * two queries) re-executes its whole lineage per consumer. The reference
  * inserts TAKsplit activities at shared fan-out points; our analog walks
  * the analyzed plan, finds subtrees whose canonical form occurs more than
  * once, and registers the MAXIMAL ones with Spark's CacheManager — every
  * subsequent (or current) plan containing a canonically-equal subtree then
  * reads the materialized form automatically.
  */
object AutoCse {

  /** Cache every maximal subplan that appears at least `minOccurrences`
    * times inside `df`'s plan. Returns the number of subplans cached.
    * Leaf relations are skipped (a bare scan re-read is cheaper than a
    * cache round-trip at 100 TB; the win is shared COMPUTE).
    */
  def cacheShared(df: DataFrame, minOccurrences: Int = 2): Int =
    cacheSharedReleasable(df, minOccurrences)._1

  /** Like [[cacheShared]] but also returns a release handle that uncaches
    * every subplan this call registered. Unlike loop checkpoints
    * (Workflow.Checkpointed), these ARE CacheManager entries, so
    * `unpersist()` genuinely frees them — but nothing did so
    * automatically: a long-lived session that auto-CSEs many queries
    * would accumulate materialized subplans until memory pressure
    * evicts them. Call `release()` once the consuming queries have run
    * (AutoCseSpec pins that pinned storage returns to zero).
    */
  def cacheSharedReleasable(df: DataFrame,
      minOccurrences: Int = 2): (Int, () => Unit) = {
    val spark = df.sparkSession
    val plan = df.queryExecution.analyzed

    // count canonicalized subtrees (and keep one original instance each)
    val counts = scala.collection.mutable.HashMap.empty[LogicalPlan, Int]
    val originals = scala.collection.mutable.HashMap.empty[LogicalPlan, LogicalPlan]
    plan.foreach { node =>
      if (!node.isInstanceOf[LeafNode]) {
        val c = node.canonicalized
        counts.update(c, counts.getOrElse(c, 0) + 1)
        originals.getOrElseUpdate(c, node)
      }
    }

    // cache maximal shared subtrees: walk top-down, stop descending once a
    // node qualifies (children are covered by the parent's materialization)
    val registered = scala.collection.mutable.ListBuffer.empty[DataFrame]
    val done = scala.collection.mutable.HashSet.empty[LogicalPlan]
    def walk(node: LogicalPlan): Unit = {
      val c = node.canonicalized
      val qualifies = !node.isInstanceOf[LeafNode] &&
        counts.getOrElse(c, 0) >= minOccurrences
      if (qualifies) {
        if (done.add(c)) {
          val cachedDf = GraftBridge.ofRows(spark, originals(c))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          registered += cachedDf
        }
      } else node.children.foreach(walk)
    }
    walk(plan)
    val frames = registered.toList
    (frames.size, () => frames.foreach(_.unpersist(blocking = false)))
  }
}
