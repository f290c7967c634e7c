package graft

import graft.ops.Ranges
import org.apache.spark.sql.functions._

/** Range-join semantics on hand-built frames: half-open bounds, pair
  * uniqueness across shared buckets (the max-start-bucket trick), width
  * independence, and the plan contract (equi-join on the bucket id, never
  * a nested-loop/cartesian).
  */
class RangesSpec extends SparkSpec {
  import spark.implicits._

  private def pts(rows: (Int, Long)*) =
    rows.toDF("pid", "t").select(col("pid"), timestamp_seconds(col("t")).as("t"))
  private def ivs(rows: (Int, Long, Long)*) =
    rows.toDF("iid", "s", "e").select(col("iid"),
      timestamp_seconds(col("s")).as("s"), timestamp_seconds(col("e")).as("e"))

  test("point-in-interval is half-open: start included, end excluded") {
    val p = pts((1, 100L), (2, 200L), (3, 150L))
    val iv = ivs((10, 100L, 200L))
    val got = Ranges.pointInInterval(p, iv, "t", "s", "e", 50L)
      .select(col("pid")).collect().map(_.getInt(0)).sorted
    assert(got.toSeq == Seq(1, 3)) // 100 in, 150 in, 200 (== end) out
  }

  test("a point matches every containing interval, once each, regardless " +
      "of how many buckets the interval spans") {
    val p = pts((1, 500L))
    // 10-second buckets: the [0, 1000) interval spans 100 buckets — the
    // point must still match exactly once
    val iv = ivs((10, 0L, 1000L), (11, 400L, 600L), (12, 501L, 600L))
    val got = Ranges.pointInInterval(p, iv, "t", "s", "e", 10L)
      .select(col("iid")).collect().map(_.getInt(0)).sorted
    assert(got.toSeq == Seq(10, 11))
  }

  test("overlap join: touching intervals (end == start) do NOT overlap; " +
      "each overlapping pair appears exactly once") {
    val a = ivs((1, 0L, 100L), (2, 100L, 200L)).toDF("a_id", "as", "ae")
    val b = ivs((7, 50L, 150L), (8, 200L, 300L)).toDF("b_id", "bs", "be")
    val got = Ranges.intervalOverlap(a, b, "as", "ae", "bs", "be", 10L)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted
    // (1,7): 0-100 × 50-150 overlap; (2,7): 100-200 × 50-150 overlap;
    // (2,8): 100-200 touches 200-300 at the boundary — no overlap.
    // With 10s buckets both pairs share many buckets — exactly-once matters.
    assert(got.toSeq == Seq((1, 7), (2, 7)))
  }

  test("bucket width does not change the result, only the plan constants") {
    val a = ivs((1, 0L, 95L), (2, 60L, 300L), (3, 250L, 260L)).toDF("a_id", "as", "ae")
    val b = ivs((7, 90L, 110L), (8, 255L, 256L), (9, 300L, 400L)).toDF("b_id", "bs", "be")
    val widths = Seq(1L, 7L, 100L, 1000L)
    val results = widths.map { w =>
      Ranges.intervalOverlap(a, b, "as", "ae", "bs", "be", w)
        .select(col("a_id"), col("b_id")).collect()
        .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    }
    assert(results.distinct.size == 1, s"widths disagree: $results")
    assert(results.head == Seq((1, 7), (2, 7), (2, 8), (3, 8)))
  }

  test("plan contract: bucketed range join is an equi-join — no " +
      "BroadcastNestedLoopJoin, no CartesianProduct") {
    val df = SparkEntry.queries("q208_range_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
    assert(plan.contains("Join"), s"expected an equi-join on the bucket id:\n$plan")
    assert(plan.contains("Generate explode"), s"interval explode missing:\n$plan")
  }

  test("overlap counts (boundary sweep) == naive inequality-join counts, " +
      "including boundary ties, duplicate keys, and zero-count drop") {
    // adversarial layout: touching ends, identical intervals, duplicate
    // a-keys (counts must SUM), an a with no overlaps (must be absent),
    // equal start/end collisions across sides
    val a = ivs((1, 0L, 100L), (2, 100L, 200L), (2, 50L, 60L),
      (3, 500L, 600L), (4, 150L, 150L)).toDF("a_id", "as", "ae")
    val b = ivs((7, 50L, 150L), (8, 200L, 300L), (9, 50L, 150L),
      (10, 60L, 100L), (11, 100L, 101L)).toDF("b_id", "bs", "be")
    val naive = a.join(b, col("as") < col("be") && col("bs") < col("ae"))
      .groupBy(col("a_id")).agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
    val swept = Ranges.intervalOverlapCounts(
        a, Seq("a_id"), "as", "ae", b, "bs", "be", "n")
      .as[(Int, Long)].collect().toMap
    assert(swept == naive)
  }

  test("overlap counts fail loudly on degenerate intervals (r19 advice): " +
      "zero-width b and inverted a raise; zero-width a stays exact") {
    val a = ivs((1, 0L, 100L)).toDF("a_id", "as", "ae")
    val zeroB = ivs((7, 50L, 50L)).toDF("b_id", "bs", "be")
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(e => s"${e.getClass.getName}: ${e.getMessage}").mkString(" <- ")
    val ex1 = intercept[Exception] {
      Ranges.intervalOverlapCounts(
        a, Seq("a_id"), "as", "ae", zeroB, "bs", "be", "n").collect()
    }
    assert(chain(ex1).contains("degenerate"), chain(ex1))
    val invA = ivs((1, 100L, 0L)).toDF("a_id", "as", "ae")
    val b = ivs((7, 10L, 20L)).toDF("b_id", "bs", "be")
    val ex2 = intercept[Exception] {
      Ranges.intervalOverlapCounts(
        invA, Seq("a_id"), "as", "ae", b, "bs", "be", "n").collect()
    }
    assert(chain(ex2).contains("degenerate"), chain(ex2))
    // zero-width a is WITHIN the precondition and must match the join form
    val zeroA = ivs((1, 50L, 50L), (2, 5L, 15L)).toDF("a_id", "as", "ae")
    val naive = zeroA.join(b, col("as") < col("be") && col("bs") < col("ae"))
      .groupBy(col("a_id")).agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
    val swept = Ranges.intervalOverlapCounts(
        zeroA, Seq("a_id"), "as", "ae", b, "bs", "be", "n")
      .as[(Int, Long)].collect().toMap
    assert(swept == naive, s"swept=$swept naive=$naive")
  }

  test("suggestBucketSec tracks the p75 interval length") {
    val iv = ivs((1, 0L, 10L), (2, 0L, 20L), (3, 0L, 30L), (4, 0L, 1000L))
    val w = Ranges.suggestBucketSec(iv, "s", "e")
    assert(w >= 20L && w <= 1000L, s"got $w")
  }
}
