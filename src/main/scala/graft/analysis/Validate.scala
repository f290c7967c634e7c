package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset quality contracts — the batch-level big brother of ECL's
  * row-level ASSERT (`ecl/hql` no_assert; our runtime SORTED assert in
  * `GraftFrame.checkSorted`): declare expectations over a table, get one
  * tiny violations report back. The shapes a 100 TB ingest actually
  * checks: NOT NULL, domain ranges, key uniqueness, and referential
  * integrity against a dimension.
  *
  * Lowering: every rule folds into ONE pass where possible — all
  * predicate rules (notNull/inRange/satisfies) become conditional counts
  * in a single aggregate over a single scan; uniqueness is one keyed
  * aggregate; referential integrity is one anti join against the
  * (broadcastable) dimension keys. The report is rule-count-sized.
  */
object Validate {

  sealed trait Rule { def name: String }
  /** Row-predicate expectation: violation = rows where `ok` is false. */
  final case class Predicate(name: String, ok: Column) extends Rule
  /** Key-uniqueness expectation: violation = rows beyond the first per key. */
  final case class Unique(name: String, keys: Seq[String]) extends Rule
  /** Referential integrity: violation = rows whose `fk` misses `dimKeys`. */
  final case class RefIntegrity(name: String, fk: String,
      dim: DataFrame, dimKey: String) extends Rule

  def notNull(c: String): Rule = Predicate(s"not_null:$c", col(c).isNotNull)
  def inRange(c: String, lo: Double, hi: Double): Rule =
    Predicate(s"in_range:$c", col(c) >= lo && col(c) <= hi)
  def satisfies(name: String, ok: Column): Rule = Predicate(name, ok)
  def unique(keys: String*): Rule =
    Unique(s"unique:${keys.mkString(",")}", keys)
  def refIntegrity(fk: String, dim: DataFrame, dimKey: String): Rule =
    RefIntegrity(s"ref:$fk->$dimKey", fk, dim, dimKey)

  /** Violations report: (rule: string, n_violations: long), one row per
    * rule, ordered by rule name.
    */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val preds = rules.collect { case p: Predicate => p }
    val predReport: Option[DataFrame] =
      if (preds.isEmpty) None
      else Some(df.agg(
        count(when(!preds.head.ok, 1)).as("n0"),
        preds.tail.zipWithIndex.map { case (p, i) =>
          count(when(!p.ok, 1)).as(s"n${i + 1}") }: _*)
        // Typed unpivot (array-of-structs + inline) rather than a
        // selectExpr/stack string: rule names are data, not SQL, so no
        // quoting rules apply and any name round-trips verbatim.
        .select(inline(array(preds.zipWithIndex.map { case (p, i) =>
          struct(lit(p.name).as("rule"), col(s"n$i").as("n_violations"))
        }: _*))))
    val others = rules.collect {
      case Unique(name, keys) =>
        df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum(col("__c") - 1), lit(0L)).as("n_violations"))
          .select(lit(name).as("rule"), col("n_violations"))
      case RefIntegrity(name, fk, dim, dimKey) =>
        // r19 (guide §3.1): the dim key set is NOT necessarily small —
        // q222 references orders, which scales with the fact — so the
        // previous forced broadcast built a fact-scaled hash relation
        // (a 100 TB scale-killer). Shape now: per-key row counts first
        // (partial agg collapses the fact ~4× before its one exchange,
        // and the agg output is already hash-partitioned on fk, so the
        // anti join reuses that side's partitioning); strategy is left
        // to the planner/AQE, which still broadcasts genuinely small
        // dims at runtime.
        df.select(col(fk)).filter(col(fk).isNotNull)
          .groupBy(col(fk)).agg(count(lit(1)).as("__n"))
          .join(dim.select(col(dimKey)).distinct(),
            col(fk) === col(dimKey), "left_anti")
          .agg(coalesce(sum(col("__n")), lit(0L)).as("n_violations"))
          .select(lit(name).as("rule"), col("n_violations"))
    }
    (predReport.toSeq ++ others)
      .reduce(_ unionByName _)
      .orderBy(col("rule"))
  }
}
