package graft.sources

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** KEYDIFF / KEYPATCH (SURVEY §2.10; TAK :945-946, helpers :2037/:2047):
  * delta generation between two versions of a keyed table, and re-applying
  * that delta — the reference diffs/patches index files; we diff/patch
  * sorted keyed tables (Delta-style MERGE expressed as joins).
  */
object KeyDiff {

  /** KEYDIFF(old, new): rows labeled 'I' (insert), 'D' (delete),
    * 'U' (update — same key, different payload). Full-outer join on key.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    val payload = oldDf.columns.filterNot(keys.contains)
    val o = payload.foldLeft(oldDf) { (d, c) => d.withColumnRenamed(c, s"__o_$c") }
      .withColumn("__o_present", lit(true))
    val n = payload.foldLeft(newDf) { (d, c) => d.withColumnRenamed(c, s"__n_$c") }
      .withColumn("__n_present", lit(true))
    val joined = o.join(n, keys, "full_outer")
    val changed = payload.map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduce(_ || _)
    val op = when(col("__o_present").isNull, "I")
      .when(col("__n_present").isNull, "D")
      .when(changed, "U")
    val outPayload = payload.map(c =>
      coalesce(col(s"__n_$c"), col(s"__o_$c")).as(c))
    joined.withColumn("__op", op)
      .filter(col("__op").isNotNull)
      .select(keys.map(col) ++ outPayload :+ col("__op"): _*)
  }

  /** KEYPATCH(old, delta): applies a [[diff]] output to reproduce `new`. */
  def patch(oldDf: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    val payload = oldDf.columns.filterNot(keys.contains)
    val deletesAndUpdates = delta.filter(col("__op").isin("D", "U"))
      .select(keys.map(col): _*)
    val survivors = oldDf.join(deletesAndUpdates, keys, "left_anti")
    val additions = delta.filter(col("__op").isin("I", "U"))
      .select(keys.map(col) ++ payload.map(col): _*)
    survivors.unionByName(additions)
  }
}
