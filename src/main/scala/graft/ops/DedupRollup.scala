package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DEDUP / ROLLUP / ITERATE / PROCESS — the reference's ordered-stateful
  * scan family (SURVEY §2.7; helpers `rtl/include/eclhelper.hpp:1535` DEDUP,
  * `:1520` ROLLUP, `:1344` ITERATE, `:1352` PROCESS). These consume
  * *adjacent* rows in dataset/group order — HPCC's substitute for SQL window
  * functions.
  *
  * Scale notes: per-group variants shuffle once on the group key and then
  * run embarrassingly parallel (window functions / sorted `flatMapGroups`).
  * Whole-dataset ordered scans are inherently sequential — the run-id
  * sessionization trick (`sum(changeFlag) over order`) keeps ROLLUP/DEDUP
  * parallel after a single global sort, which is how they stay viable at
  * 100 TB. Only a truly global ITERATE (carried state with no group key)
  * degrades to a single-partition pass (SURVEY §7.4).
  */
object DedupRollup {

  /** DEDUP(ds, cond) on sorted input: remove ADJACENT rows whose keys equal
    * the previous row's (helper flags `HDFwholerecord/compareall` :1526).
    * Lowered via lag() over the defining order — one shuffle for the sort.
    */
  def dedupAdjacent(df: DataFrame, keys: Seq[Column],
      order: Seq[Column]): DataFrame = {
    val w = Window.orderBy(order: _*)
    val sameAsPrev = keys.map(k => lag(k, 1).over(w) <=> k)
      .reduce(_ && _)
    df.withColumn("__dup", coalesce(sameAsPrev, lit(false)))
      .filter(!col("__dup")).drop("__dup")
  }

  /** DEDUP(ds, key, ALL) / hash dedup (TAKhashdedup :906): compare all rows
    * regardless of adjacency, keep one per key — `dropDuplicates`.
    */
  def dedupAll(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** DEDUP(..., KEEP n): first n rows per key in `order`
    * (`numToKeep` :1535 region).
    */
  def dedupKeepN(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      n: Int): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn")
  }

  /** DEDUP(..., BEST(sortOrder)): keep the best row per key, "best" = first
    * under `best` ordering (HDFkeepbest :1532).
    */
  def dedupBest(df: DataFrame, keys: Seq[Column], best: Seq[Column]): DataFrame =
    dedupKeepN(df, keys, best, 1)

  /** Assign a run id to each maximal run of adjacent rows with equal keys —
    * the sessionization primitive under ROLLUP and adjacent-DEDUP: runId =
    * cumulative count of key-changes over the order. Parallel after one sort.
    */
  def runIds(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      runCol: String): DataFrame = {
    val w = Window.orderBy(order: _*)
    val changed = keys.map(k => !(lag(k, 1).over(w) <=> k))
      .reduce(_ || _)
    df.withColumn("__chg", when(coalesce(changed, lit(true)), 1).otherwise(0))
      .withColumn(runCol, sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__chg")
  }

  /** ROLLUP(ds, cond, t(L,R)) where the transform is an associative fold
    * (the overwhelmingly common case): group by run id and aggregate
    * (helper :1520). `keys` are constant within a run and are preserved in
    * the output; `aggs` produce the folded columns.
    */
  def rollupRuns(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    runIds(df, keys, order, "__run")
      .groupBy(col("__run") +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .drop("__run")

  /** ITERATE(ds, t(LEFT, RIGHT)) per group: out(n) = t(out(n-1), in(n)).
    * General (non-associative) form: sorted fold inside `flatMapGroups` —
    * parallel across groups, sequential within (exactly the reference's
    * execution shape). `fold` receives the previous OUTPUT row (None for the
    * first) and the current input row and returns the output row.
    *
    * For folds expressible as window aggregates (running sum/max/min/count)
    * prefer [[runningAgg]] — it stays in whole-stage codegen.
    */
  def iterateGroups(df: DataFrame, groupKeys: Seq[String], order: Seq[Column],
      outSchema: org.apache.spark.sql.types.StructType)(
      fold: (Option[Row], Row) => Row): DataFrame = {
    val schema = df.schema
    val keyIdx = groupKeys.map(schema.fieldIndex)
    // Secondary sort: one shuffle co-locates each group, then a partition-
    // local sort makes groups contiguous AND ordered. A groupByKey here
    // would re-shuffle and destroy the order — mapPartitions with group-
    // boundary detection is the order-preserving (and cheaper) lowering.
    val sorted = df.repartition(groupKeys.map(col): _*)
      .sortWithinPartitions((groupKeys.map(col) ++ order): _*)
    implicit val rowEnc = Encoders.row(outSchema)
    sorted.mapPartitions { rows =>
      var prevKey: Seq[Any] = null
      var prev: Option[Row] = None
      rows.map { r =>
        val k = keyIdx.map(r.get)
        if (k != prevKey) { prev = None; prevKey = k }
        val out = fold(prev, r)
        prev = Some(out)
        out
      }
    }(rowEnc)
  }

  /** Running aggregate over order within groups — the codegen-friendly
    * ITERATE lowering for associative state.
    */
  def runningAgg(df: DataFrame, groupKeys: Seq[Column], order: Seq[Column],
      agg: Column, as: String): DataFrame = {
    val w = Window.partitionBy(groupKeys: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn(as, agg.over(w))
  }

  /** GROUP(ds, keys) — plan-time state in our model: subsequent grouped ops
    * take the keys explicitly (SURVEY §2.7: no data movement needed).
    * Provided for API completeness.
    */
  def group(df: DataFrame, keys: Seq[String]): (DataFrame, Seq[String]) =
    (df, keys)
}
