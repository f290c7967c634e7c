package graft.tools

import graft.{SparkEntry, Tables}
import graft.text.Embeddings
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc timing probe for q92_ann_bucketed (dev tool). */
object Q92Probe {
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

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val emb = Tables.embeddings(spark, dir)
    val bk = time("rpLshBucket") {
      val b = Embeddings.rpLshBucket(emb, col("vec_id"), col("embedding"), 8)
      b.cache(); println("  rows=" + b.count()); b
    }
    val withB = emb.join(bk, "vec_id")
    val q = withB.select(col("vec_id").as("qv_id"), col("embedding").as("q_emb"), col("bucket"))
    val c = withB.select(col("vec_id").as("cv_id"), col("embedding").as("c_emb"), col("bucket").as("bucket_c"))
    val pairs = time("pairs") {
      val p = q.join(c, col("bucket") === col("bucket_c") && col("qv_id") =!= col("cv_id"))
      println("  rows=" + p.count()); p
    }
    time("pairs explain") { pairs.explain("formatted") }
    val topk = time("cosinePairsTopK") {
      val t = Embeddings.cosinePairsTopK(pairs, col("qv_id"), col("cv_id"),
        col("q_emb"), col("c_emb"), 3).orderBy(col("q_id"), col("rank"))
      println("  rows=" + t.count()); t
    }
    time("full q92 via SparkEntry") {
      println("  rows=" + SparkEntry.queries("q92_ann_bucketed")(spark, dir).count())
    }
    topk.explain("formatted")
    spark.stop()
  }
}
