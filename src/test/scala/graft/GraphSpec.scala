package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Connected-components semantics the q99 oracle can't isolate: chain
  * collapse (the O(diameter) killer for naive propagation), isolated
  * vertices, orientation/duplicate-edge insensitivity, determinism.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def cc(verts: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val v = verts.toDF("id")
    val e = edges.toDF("a", "b")
    Graph.connectedComponents(v, col("id"), e, col("a"), col("b"))
      .as[(Long, Long)].collect().toMap
  }

  test("long chain collapses to the min id (star contraction, not diameter walks)") {
    val n = 200L
    val labels = cc(1L to n, (1L until n).map(i => (i, i + 1)))
    assert(labels.size == n)
    assert(labels.values.forall(_ == 1L))
  }

  test("separate components keep separate min labels; isolated nodes label themselves") {
    val labels = cc(Seq(1L, 2L, 3L, 10L, 11L, 99L),
      Seq((2L, 3L), (10L, 11L), (3L, 1L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("edge orientation, duplicates, and self-loops don't change the labeling") {
    val base = cc(1L to 5L, Seq((1L, 2L), (2L, 3L), (4L, 5L)))
    val messy = cc(1L to 5L,
      Seq((2L, 1L), (1L, 2L), (3L, 2L), (2L, 3L), (5L, 4L), (3L, 3L)))
    assert(base == messy)
    assert(base == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("labels are deterministic across runs and partitionings") {
    val edges = (1L to 60L).flatMap(i => Seq((i, i % 7 + 100L)))
    val a = cc(1L to 60L, edges)
    val b = Graph.connectedComponents(
        (1L to 60L).toDF("id").repartition(13), col("id"),
        edges.toDF("a", "b").repartition(7), col("a"), col("b"))
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}
