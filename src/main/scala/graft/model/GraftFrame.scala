package graft.model

import graft.ops.{DedupRollup, Sorting}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The GROUPED-dataset model (SURVEY §1.1, §2.7): in the reference a
  * GROUP'ed dataset changes the meaning of every downstream operator —
  * SORT/DEDUP/TOPN/ROLLUP/aggregate apply PER GROUP until DEGROUP
  * (`type_groupedtable=23` `system/include/rtlconst.hpp:49`; runtime
  * end-of-group markers `common/thorhelper/thorcommon.hpp:181`).
  *
  * Spark needs no runtime markers: grouping is PLAN-TIME state. GraftFrame
  * is the single choke point — it carries the active group keys and routes
  * each op to its global or windowed/grouped lowering. This mirrors how the
  * reference's compiler resolves `TAKsort` vs grouped sort from the
  * dataset's type, not from a runtime flag.
  */
final case class GraftFrame(df: DataFrame, groupKeys: Seq[String] = Nil) {

  private def grouped: Boolean = groupKeys.nonEmpty
  private def keyCols: Seq[Column] = groupKeys.map(col)

  /** GROUP(ds, keys) — enter grouped mode (TAKgroup :901). */
  def group(keys: String*): GraftFrame = copy(groupKeys = keys)

  /** GROUP(ds) — degroup (TAKdegroup :900). */
  def degroup: GraftFrame = copy(groupKeys = Nil)

  /** REGROUP (TAKregroup :982): append grouped datasets with the SAME group
    * keys, groups interleaved by key — a union that preserves grouping.
    */
  def regroup(other: GraftFrame): GraftFrame = {
    require(other.groupKeys == groupKeys,
      "REGROUP requires identical group keys")
    copy(df = df.unionByName(other.df))
  }

  /** SORT: global when ungrouped. Grouped SORT only promises order WITHIN
    * each group, so it lowers to hash-repartition on the group keys +
    * per-partition sort — no global range exchange (the reference's grouped
    * sort is likewise a local per-group sort, not a Thor global sort).
    */
  def sort(keys: Column*): GraftFrame =
    if (!grouped) copy(df = df.orderBy(keys: _*))
    else copy(df = df.repartition(keyCols: _*)
      .sortWithinPartitions(keyCols ++ keys: _*))

  /** DEDUP(keys) adjacent-after-sort semantics: per group when grouped. */
  def dedup(keys: Column*): GraftFrame =
    if (!grouped) copy(df = df.dropDuplicates(keys.map(_.toString)))
    else copy(df = DedupRollup.dedupKeepN(df, keyCols ++ keys, keys, 1))

  /** TOPN: global heap vs per-group window rank. */
  def topn(n: Int, order: Column*): GraftFrame =
    if (!grouped) copy(df = Sorting.topn(df, n, order))
    else copy(df = Sorting.topnGrouped(df, n, keyCols, order))

  /** TABLE/aggregate: whole-dataset vs per-group (TAKaggregate :896). */
  def aggregate(aggs: Column*): GraftFrame =
    if (!grouped) copy(df = df.agg(aggs.head, aggs.tail: _*))
    else GraftFrame(df.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*))

  /** ROLLUP as per-group fold (grouped mode required in ECL). */
  def rollup(order: Seq[Column], runKeys: Seq[Column],
      aggs: Seq[Column]): GraftFrame = {
    require(grouped, "ROLLUP requires a grouped dataset")
    copy(df = DedupRollup.rollupRuns(df, keyCols ++ runKeys,
      keyCols ++ order, aggs))
  }

  /** ITERATE: per-group running fold via window (associative case). The
    * window is safe only when grouped (partitioned by the group keys);
    * ungrouped global running sums route through the two-pass
    * [[graft.ops.Positions.runningSumSorted]] scan — a bare
    * `Window.orderBy` would serialize the whole dataset onto one partition.
    */
  def runningSum(c: Column, order: Seq[Column], as: String): GraftFrame =
    if (grouped) {
      val w = Window.partitionBy(keyCols: _*).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, 0)
      copy(df = df.withColumn(as, sum(c).over(w)))
    } else copy(df = graft.ops.Positions.runningSumSorted(df, c, order, as))

  /** CHOOSEN per group (grouped FIRSTN) or global limit. */
  def choosen(n: Int, order: Seq[Column]): GraftFrame =
    if (!grouped) copy(df = df.limit(n))
    else copy(df = Sorting.topnGrouped(df, n, keyCols, order))

  /** Dataset-level IF (TAKif :914): branch chosen at plan time. */
  def ifElse(cond: Boolean, other: => GraftFrame): GraftFrame =
    if (cond) this else other

  /** APPLY (TAKapply :904): driver-side side effect per row. */
  def apply_(f: org.apache.spark.sql.Row => Unit): Unit =
    df.foreach(new org.apache.spark.api.java.function.ForeachFunction[
      org.apache.spark.sql.Row] { def call(r: org.apache.spark.sql.Row): Unit = f(r) })
}
