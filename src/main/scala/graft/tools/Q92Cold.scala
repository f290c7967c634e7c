package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Cold-run probe for q92 exactly as Bench runs it (dev tool). */
object Q92Cold {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = SparkEntry.queries("q92_ann_bucketed")(spark, dir).count()
    println(f"[cold] q92 rows=$n took ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
