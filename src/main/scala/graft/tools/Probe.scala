package graft.tools

import graft.Tables
import graft.text.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc plan/timing probe (dev tool, not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val sh = time("shingles count") {
      val s = TextOps.shingles(Tables.documents(spark, dir), col("doc_id"), col("text"), 3)
      s.cache(); println("  rows=" + s.count()); s
    }
    val mh = time("minhash count") {
      val m = TextOps.minhash(sh, 8); m.cache(); println("  rows=" + m.count()); m
    }
    val bands = time("bands count") {
      val b = TextOps.lshBands(mh, 2); b.cache(); println("  rows=" + b.count()); b
    }
    val cand = time("candidates count") {
      val c = TextOps.lshCandidates(bands); println("  rows=" + c.count()); c
    }
    time("candidates again (cached upstream)") { println("  rows=" + cand.count()) }
    val jac = time("jaccard over candidates") {
      val j = TextOps.jaccard(cand, sh)
      println("  rows=" + j.count()); j
    }
    time("simhash16") {
      println("  rows=" + TextOps.simhash16(
        Tables.documents(spark, dir), col("doc_id"), col("text")).count())
    }
    spark.stop()
  }
}
