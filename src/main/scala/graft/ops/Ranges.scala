package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) joins: point-in-interval and interval-overlap — the
  * second half of the temporal-join family next to [[Temporal.asofJoin]].
  * ECL expresses these as JOIN with inequality conditions, which the
  * reference executes as an ALL join (nested loop — `TAKalljoin`,
  * `rtl/include/eclhelper.hpp`); Spark's native lowering for a pure
  * inequality condition is likewise BroadcastNestedLoopJoin — O(|L|·|R|).
  *
  * Lowering here — bucketed equi-join: pick a bucket width `w`, map each
  * point to bucket floor(t/w), explode each interval to every bucket it
  * spans, then EQUI-join on the bucket id with the exact range predicate
  * as the residual. Cost: one linear explode (intervals × avg-span/w
  * buckets) + one hash-partitioned equi-join — shuffle-parallel on the
  * bucket key, never a cartesian. Worst-case blowup is controlled by `w`:
  * choose w ≈ typical interval length so the average interval lands in
  * ~2 buckets.
  *
  * The overlap variant is dedup-free: a candidate pair could meet in every
  * shared bucket, so each pair is counted ONLY in the bucket holding
  * max(start1, start2) — which both sides span by definition of overlap —
  * making the match unique without a distinct.
  */
object Ranges {

  /** Point-in-interval join (inner): rows of `points` paired with every
    * row of `intervals` whose [startCol, endCol) half-open range contains
    * the point. Columns from both inputs survive; name collisions are the
    * caller's to resolve.
    *
    * @param bucketSec bucket width in seconds; choose ≈ the typical
    *        interval length (explode factor = span/width + 1).
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointTs: String,
      startTs: String,
      endTs: String,
      bucketSec: Long): DataFrame = {
    val p = points.withColumn("__rj_b",
      floor(unix_micros(col(pointTs)) / lit(bucketSec * 1000000L)))
    val iv = intervals.withColumn("__rj_b",
      explode(sequence(
        floor(unix_micros(col(startTs)) / lit(bucketSec * 1000000L)),
        // end is exclusive: a point exactly at `end` does not match, so the
        // last candidate bucket is the one containing end - 1µs
        floor((unix_micros(col(endTs)) - lit(1L)) / lit(bucketSec * 1000000L)))))
    p.join(iv, Seq("__rj_b"))
      .filter(col(pointTs) >= col(startTs) && col(pointTs) < col(endTs))
      .drop("__rj_b")
  }

  /** Interval-overlap join (inner): pairs (a, b) with
    * a.start < b.end AND b.start < a.end (half-open overlap). Dedup-free:
    * the pair materializes only in the bucket of max(aStart, bStart).
    */
  def intervalOverlap(
      a: DataFrame,
      b: DataFrame,
      aStart: String, aEnd: String,
      bStart: String, bEnd: String,
      bucketSec: Long): DataFrame = {
    val w = bucketSec * 1000000L
    val ae = a.withColumn("__rj_b",
      explode(sequence(
        floor(unix_micros(col(aStart)) / lit(w)),
        floor((unix_micros(col(aEnd)) - lit(1L)) / lit(w)))))
    val be = b.withColumn("__rj_bb",
      explode(sequence(
        floor(unix_micros(col(bStart)) / lit(w)),
        floor((unix_micros(col(bEnd)) - lit(1L)) / lit(w)))))
    ae.join(be, col("__rj_b") === col("__rj_bb"))
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      // count each overlapping pair exactly once: in the bucket that
      // contains the later of the two starts (both sides span it)
      .filter(col("__rj_b") ===
        floor(greatest(unix_micros(col(aStart)), unix_micros(col(bStart))) / lit(w)))
      .drop("__rj_b", "__rj_bb")
  }

  /** Median-ish interval length (seconds) — the bucket-width heuristic for
    * callers that don't know their span distribution. One aggregate, one
    * scalar to the driver (bounded).
    */
  def suggestBucketSec(intervals: DataFrame, startTs: String, endTs: String): Long = {
    val row = intervals.select(
      percentile_approx((unix_micros(col(endTs)) - unix_micros(col(startTs))) / lit(1000000L),
        lit(0.75), lit(1000)).as("p"))
      .collect().head
    math.max(1L, row.getAs[Number]("p").longValue())
  }
}
