package graft.tools

import graft.Tables
import graft.text.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: LSH bucket-size distribution for the documents corpus at a
  * given sf dir — sizes the `maxBucket` skew-guard threshold in
  * `TextOps.lshJaccardPairs` against real fixture skew (usage:
  * `runMain graft.tools.BucketStats [sfDir]`).
  */
object BucketStats {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sets = TextOps.shingleSet(Tables.documents(spark, dir),
      col("doc_id"), col("text"), 3)
    val bands = TextOps.lshBandKeys(TextOps.minhashSig(sets, 8), 8, 2)
    val threshold = TextOps.DefaultMaxBucket
    val sizes = bands.groupBy("band", "bk").agg(count(lit(1)).as("n"))
    sizes.agg(max("n").as("max_bucket"), count(lit(1)).as("n_buckets"),
        sum(when(col("n") > threshold, 1).otherwise(0))
          .as(s"over_$threshold"),
        sum(when(col("n") > 1, col("n") * (col("n") - 1) / 2))
          .as("total_pairs"))
      .show(false)
    sizes.orderBy(col("n").desc).show(10, false)
    spark.stop()
  }
}
