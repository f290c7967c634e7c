package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set-operation / multi-input / reshaping operators (SURVEY §2.8, §2.10):
  * FUNNEL (append), MERGE, NONEMPTY, COMBINE (positional zip), NORMALIZE
  * (fan-out + child explode), REGROUP. Helpers
  * `rtl/include/eclhelper.hpp:1629` funnel, `:1639` merge, `:1635` nonempty,
  * `:1411` combine, `:1372` normalize, `:1482` normalize-child.
  */
object Shape {

  /** ds1 + ds2 (TAKfunnel :903) — concatenation. */
  def funnel(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_ unionAll _)

  /** TAKsplit (:892): fan a stream out to N consumers. Spark recomputes
    * shared lineage per action, so the split analog is an explicit persist —
    * the one optimizer capability Catalyst does NOT provide (SURVEY §4.1
    * CSE row). Use on any subplan consumed more than once.
    */
  def split(df: DataFrame): DataFrame =
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** MERGE(ds1, ds2, SORTED(keys) [, DEDUP]) (TAKmerge :937): ordered merge
    * of sorted inputs. In a declarative plan union+orderBy yields the same
    * ordered stream; Catalyst reuses the inputs' sortedness where possible.
    */
  def merge(dfs: Seq[DataFrame], keys: Seq[Column],
      dedup: Boolean = false): DataFrame = {
    val u = funnel(dfs)
    val d = if (dedup) u.dropDuplicates() else u
    d.orderBy(keys: _*)
  }

  /** NONEMPTY(ds1, ds2, ...) (TAKnonempty :1008): first non-empty input.
    * Plan-time choice on the driver; probes with limit(1) so no input is
    * fully evaluated.
    */
  def nonempty(dfs: Seq[DataFrame]): DataFrame =
    dfs.find(!_.isEmpty).getOrElse(dfs.last.limit(0))

  /** COMBINE(ds1, ds2, t(L,R)) (TAKcombine :981): POSITIONAL zip of two
    * equal-length datasets. Spark has no ordered zip at the SQL layer;
    * both sides get a row_number over their defining order and join on it.
    * (An RDD zipPartitions path would avoid the shuffle but requires equal
    * partitioning — the window form is the portable default.)
    */
  def combine(l: DataFrame, lOrder: Seq[Column], r: DataFrame,
      rOrder: Seq[Column]): DataFrame = {
    val lw = l.withColumn("__pos", row_number().over(Window.orderBy(lOrder: _*)))
    val rw = r.withColumn("__pos", row_number().over(Window.orderBy(rOrder: _*)))
    lw.join(rw, "__pos").drop("__pos")
  }

  /** NORMALIZE(ds, n, t(LEFT, COUNTER)) (TAKnormalize :907): emit n rows per
    * input row; COUNTER (1-based) lands in `counterCol`. Fan-out via
    * explode(sequence) — stays in whole-stage codegen.
    */
  def normalize(df: DataFrame, n: Column, counterCol: String): DataFrame =
    df.withColumn(counterCol, explode(sequence(lit(1), n)))

  /** NORMALIZE(ds, ds.child, t(L,R)) (TAKnormalizechild :910): explode a
    * nested child-dataset column.
    */
  def normalizeChild(df: DataFrame, childCol: String, as: String): DataFrame =
    df.withColumn(as, explode(col(childCol))).drop(childCol)

  /** PROJECT(ds, t(LEFT, COUNTER)) (TAKcountproject :917): transform sees the
    * 1-based global row position over `order`.
    */
  def countProject(df: DataFrame, order: Seq[Column],
      counterCol: String): DataFrame =
    df.withColumn(counterCol, row_number().over(Window.orderBy(order: _*)))
}
