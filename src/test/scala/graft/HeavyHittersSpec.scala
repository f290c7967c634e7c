package graft

import graft.ops.HeavyHitters
import org.apache.spark.sql.functions._

/** SpaceSaving candidate generation + exact recount: the no-false-negative
  * guarantee under adversarial layouts, bounded summary size, and
  * exactness of the final answer.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("result is EXACTLY the plain groupBy HAVING answer") {
    // zipf-ish: key i appears 1000/i times, i = 1..200
    val rows = (1 to 200).flatMap(i => Seq.fill(1000 / i)(s"k$i"))
    val df = spark.createDataset(scala.util.Random.shuffle(rows))
      .repartition(8).toDF("k")
    val total = rows.size
    val minShare = 0.01
    val expected = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= math.ceil(total * minShare).toLong).toMap
    val got = HeavyHitters.heavyHitters(df, col("k"), minShare)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("no false negatives even when the heavy key is diluted across " +
      "partitions full of unique noise") {
    // one heavy key (6% global) spread uniformly over 16 partitions, each
    // partition dominated by unique strings that churn the summary
    val heavy = Seq.fill(600)("HEAVY")
    val noise = (1 to 9400).map(i => s"n$i")
    val df = spark.createDataset(scala.util.Random.shuffle(heavy ++ noise))
      .repartition(16).toDF("k")
    val got = HeavyHitters.heavyHitters(df, col("k"), 0.05)
      .collect().map(_.getString(0)).toSet
    assert(got == Set("HEAVY"))
  }

  test("spaceSaving summary stays within capacity and keeps the guaranteed key") {
    val stream = scala.util.Random.shuffle(
      Seq.fill(300)("big") ++ (1 to 5000).map(i => s"u$i"))
    val summary = HeavyHitters.spaceSaving(stream.iterator, capacity = 32)
    assert(summary.size <= 32)
    // big has share 300/5300 ≈ 5.7% > 1/32 ≈ 3.1% → guaranteed present
    assert(summary.contains("big"))
  }

  test("ties at the minimum: eviction keeps counts monotone (no loss of " +
      "an already-counted heavy key)") {
    // interleave two heavies with floods of singletons at capacity 4
    val stream = (1 to 2000).flatMap(i => Seq("A", "B", s"x$i"))
    val summary = HeavyHitters.spaceSaving(stream.iterator, capacity = 4)
    assert(summary.contains("A") && summary.contains("B"))
  }
}
