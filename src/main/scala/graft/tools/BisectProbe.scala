package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Bisect which query degrades subsequent heavy queries in a shared JVM. */
object BisectProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q85_shingle_stats", "q86_minhash_lsh", "q87_jaccard",
        "q88_simhash", "q89_simhash_neardup", "q90_cosine_knn",
        "q90_cosine_knn", "q92_ann_bucketed")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      println(f"[bisect] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
