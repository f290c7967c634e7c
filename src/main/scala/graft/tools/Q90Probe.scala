package graft.tools
import graft.Tables
import graft.text.Embeddings
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Q90Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val emb = Tables.embeddings(spark, dir)
      val n = Embeddings.cosineTopK(emb.filter(col("vec_id") < 20), emb,
        col("vec_id"), col("vec_id"), col("embedding"), col("embedding"), 5).count()
      println(f"[q90] run$i: ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    val emb = Tables.embeddings(spark, dir)
    Embeddings.cosineTopK(emb.filter(col("vec_id") < 20), emb,
      col("vec_id"), col("vec_id"), col("embedding"), col("embedding"), 5)
      .explain("formatted")
    spark.stop()
  }
}
