package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph primitives for near-duplicate CLUSTER resolution —
  * the step after candidate generation + exact refine: near-dup relations
  * are rarely transitive-closed by construction (A~B, B~C but A!~C), so
  * corpus dedup at scale labels each document with its connected
  * component and keeps one representative per component.
  *
  * Reference contract: the reference resolves link clusters with
  * iterative JOIN + ROLLUP graph loops (`thorlcr/thorutil/thgraph`
  * loop-activity machinery; SALT's clustering generates exactly this
  * shape). Spark-native re-expression: DataFrame rounds with
  * localCheckpoint lineage truncation.
  */
object Graph {

  /** EXACT fixpoint test for two canonically-oriented distinct edge sets:
    * equal count + empty anti-join ⇒ equal sets. Both inputs are already
    * checkpointed, so this is two cheap jobs over materialized frames — a
    * hash-signature shortcut would make convergence probabilistic, and a
    * false stop silently mislabels components.
    */
  private def sameEdges(a: DataFrame, b: DataFrame,
      aCount: Long, bCount: Long): Boolean =
    aCount == bCount &&
      b.join(a, Seq("u", "v"), "left_anti").isEmpty

  /** Large-star round: every node connects its LARGER neighbors to its
    * minimum known neighbor (or itself). Input/output edges oriented
    * u > v; output is distinct. One groupBy shuffle + one join.
    */
  private[graft] def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star round: every node connects its SMALLER neighbors (its
    * whole out-neighborhood under the u > v orientation) plus itself to
    * its minimum neighbor. Output oriented u > v, distinct.
    */
  private[graft] def smallStar(edges: DataFrame): DataFrame = {
    val mins = edges.groupBy("u").agg(min(col("v")).as("m"))
    edges.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
  }

  /** Formatted physical plan of one large-star round (PLANS.md evidence —
    * the component loop itself is iterative, one such plan per round).
    */
  def largeStarPlan(edges: DataFrame): String =
    largeStar(edges).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14): O(log² n) rounds worst-case and a handful on real
    * near-dup graphs, each round two hash-shuffles. The naive
    * label-propagation alternative needs O(diameter) rounds — a chain of
    * 1M near-identical crawl snapshots would take 1M shuffles; star
    * contraction collapses it in ~log n. Rounds are localCheckpoint-ed so
    * lineage (and the plan Catalyst must analyze) stays O(1) per round,
    * not O(rounds) — the standard iterative-algorithm discipline on
    * Spark.
    *
    * `vertices`/`vid`: one row per node (isolated nodes label
    * themselves). `edges`/`src`/`dst`: undirected relation rows, any
    * orientation, self-loops ignored. Returns (id, component) where
    * component = MIN node id of the connected component — deterministic
    * regardless of partitioning or round count.
    */
  def connectedComponents(vertices: DataFrame, vid: Column,
      edges: DataFrame, src: Column, dst: Column,
      maxRounds: Int = 30): DataFrame =
    connectedComponentsReleasable(vertices, vid, edges, src, dst,
      maxRounds)._1

  /** [[connectedComponents]] plus a release handle for the RESULT's
    * checkpoint blocks (O(|V|) label rows — everything larger is already
    * released before returning). The plain variant leaves the label
    * frame pinned until the ContextCleaner collects it after a driver
    * GC; long-lived sessions running many component jobs should call
    * `release()` once the labels are consumed.
    */
  def connectedComponentsReleasable(vertices: DataFrame, vid: Column,
      edges: DataFrame, src: Column, dst: Column,
      maxRounds: Int = 30): (DataFrame, () => Unit) = {
    import graft.workflow.Workflow.checkpointEager
    val verts = vertices.select(vid.cast("long").as("id"))
    // superseded rounds release their checkpoint blocks through the RDD
    // handle (Workflow.Checkpointed) — Dataset.unpersist is a no-op on
    // checkpoints, so the previous shape silently pinned EVERY round's
    // edge set until driver GC (O(rounds·|E|) block-store pressure at
    // sf10 — the same leak class the r12 rehearsal found in LOOP)
    var e = checkpointEager(edges
      .select(src.cast("long").as("u"), dst.cast("long").as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct())
    var eCount = e.df.count()
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      // checkpoint between the stars: smallStar consumes its input twice
      // (groupBy + join) and Catalyst does not CSE across the self-join —
      // without this the large-star shuffle chain runs twice per round
      val ls = checkpointEager(largeStar(e.df))
      val next = checkpointEager(smallStar(ls.df))
      val nextCount = next.df.count()
      ls.release()
      converged = sameEdges(e.df, next.df, eCount, nextCount)
      e.release() // next is materialized and the fixpoint test is done
      eCount = nextCount
      e = next
      rounds += 1
    }
    require(converged,
      s"connectedComponents: no fixpoint after $maxRounds rounds")
    // Fixpoint is a star forest oriented child > root: child's component
    // is its (unique) out-neighbor; roots and isolated nodes label
    // themselves. The label frame is materialized EAGERLY so the final
    // edge checkpoint can be released before returning — otherwise each
    // call leaves |E| blocks pinned until driver GC, and back-to-back
    // component runs degrade as dead blocks crowd the store (measured
    // 128 s → 252 s across two sf10 runs in one session).
    val roots = e.df.groupBy(col("u").as("id")).agg(min(col("v")).as("m"))
    val out = checkpointEager(verts.join(roots, Seq("id"), "left")
      .select(col("id"), coalesce(col("m"), col("id")).as("component")))
    e.release()
    (out.df, out.release)
  }
}
