package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Forked-JVM stress probe for the LSH skew guard's MEMORY contract
  * (run by HotBucketStressSpec under a hard -Xmx cap — a heap OOM must
  * land in this sacrificial process, never the test suite's JVM).
  *
  * Builds a synthetic corpus whose band rows all land in ONE bucket —
  * the degenerate key a 100 TB crawl produces from boilerplate/template
  * spam — and runs `TextOps.lshJaccardPairs`:
  *
  *  - `guarded` (default maxBucket): the bucket routes through the
  *    distributed join, which streams and spills; the run must complete
  *    under the cap and print the closed-form pair stats (identical
  *    docs: s·(s−1)/2 pairs, inter = |set| each).
  *  - `unguarded` (maxBucket = Int.MaxValue): the bucket-local path's
  *    `collect_list` concentrates all s payloads in one in-heap
  *    aggregation buffer — the exact failure mode the guard exists to
  *    prevent. Under the cap this must die with OutOfMemoryError
  *    (the spec runs it with -XX:+ExitOnOutOfMemoryError).
  *
  * Usage: HotBucketProbe <guarded|unguarded> <docs> <shinglesPerDoc>
  */
object HotBucketProbe {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val docs = args(1).toLong
    val shingles = args(2).toInt
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      // every doc carries the same |shingles|-element set, so each pair's
      // jaccard is exactly 1.0 and the expected output is closed-form
      val sets = spark.range(docs).select(col("id").as("doc_id"),
        expr(s"transform(sequence(1, $shingles), " +
          "x -> concat('shingle_', x))").as("sset"))
      val bands = spark.range(docs).select(col("id").as("doc_id"),
        lit(0L).as("band"), lit("hot").as("bk"))
      val maxBucket =
        if (mode == "unguarded") Int.MaxValue
        else graft.text.TextOps.DefaultMaxBucket
      val out = graft.text.TextOps.lshJaccardPairs(bands, sets, 0.5, maxBucket)
        .agg(count(lit(1)).as("pairs"), sum(col("inter")).as("inter_sum"),
          min(col("jac")).as("jac_min"))
        .collect().head
      println(s"PROBE_OK pairs=${out.getLong(0)} " +
        s"inter_sum=${out.getLong(1)} jac_min=${out.getDouble(2)}")
      spark.stop()
    } catch { case t: Throwable =>
      val chain = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.toString).mkString(" | ")
      System.err.println(s"PROBE_FAIL $chain")
      sys.exit(2)
    }
  }
}
