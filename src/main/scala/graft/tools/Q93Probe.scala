package graft.tools

import graft.Tables
import graft.text.Embeddings
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of q93 (dev tool). */
object Q93Probe {
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
      println(f"[q93] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = Tables.embeddings(spark, dir)
    val bk = time("buckets") {
      val b = Embeddings.rpLshBucketTables(emb, col("vec_id"),
        col("embedding"), numPlanes = 10, numTables = 2)
      b.cache(); println("  rows=" + b.count()); b
    }
    time("bucket sizes") {
      bk.groupBy("tbl", "bucket").count()
        .agg(count(lit(1)), max("count"), avg("count")).show()
    }
    val pairs = time("candidates") {
      val p = Embeddings.annCandidatePairs(bk)
      p.cache(); println("  pairs=" + p.count()); p
    }
    val withVecs = time("attach vectors") {
      val w = pairs
        .join(emb.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")), "q_id")
        .join(emb.select(col("vec_id").as("c_id"), col("embedding").as("c_emb")), "c_id")
      w.cache(); println("  rows=" + w.count()); w
    }
    time("refine topk") {
      println("  out=" + Embeddings.cosinePairsTopK(withVecs, col("q_id"),
        col("c_id"), col("q_emb"), col("c_emb"), 3).count())
    }
    // sub-stages of cosinePairsTopK
    import org.apache.spark.sql.types.DecimalType
    val base = withVecs.select(col("q_id"), col("c_id"),
      col("q_emb"), col("c_emb"))
    val dots = time("  dots") {
      val dd = base
        .select(col("q_id"), col("c_id"),
          posexplode(zip_with(col("q_emb"), col("c_emb"),
            (a, b) => a.cast("double") * b.cast("double"))).as(Seq("pos", "prod")))
        .groupBy(col("q_id"), col("c_id"))
        .agg(sum(col("prod").cast(DecimalType(30, 12))).cast("double").as("dot"))
      dd.cache(); println("  rows=" + dd.count()); dd
    }
    val qn = time("  qn") {
      val q = Embeddings.norms(base.select(col("q_id"), col("q_emb")).distinct(),
        col("q_id"), col("q_emb"))
      q.cache(); println("  rows=" + q.count()); q
    }
    val cn = time("  cn") {
      val c = Embeddings.norms(base.select(col("c_id"), col("c_emb")).distinct(),
        col("c_id"), col("c_emb"))
      c.cache(); println("  rows=" + c.count()); c
    }
    time("  join+window") {
      val scored = dots
        .join(qn.withColumnRenamed("vec_id", "q_id").withColumnRenamed("norm", "q_norm"), "q_id")
        .join(cn.withColumnRenamed("vec_id", "c_id").withColumnRenamed("norm", "c_norm"), "c_id")
        .withColumn("cos", col("dot") / (col("q_norm") * col("c_norm")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
      println("  out=" + scored.withColumn("rank",
        row_number().over(w)).filter(col("rank") <= 3).count())
    }
    spark.stop()
  }
}
