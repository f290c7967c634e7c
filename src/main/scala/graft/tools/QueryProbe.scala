package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Ad-hoc timing probe for named queries (dev tool):
  * `runMain graft.tools.QueryProbe q150,q89 [runs]` against
  * SPARK_GRAFT_SF_DIR. Times each prefix-matched query `runs` times —
  * compare the LAST run (the JIT-warm engine number, see
  * .claude/skills/verify gotchas).
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val prefixes = (if (args.nonEmpty) args(0) else "q01").split(',')
    val runs = if (args.length > 1) args(1).toInt else 3
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, q) =>
        (1 to runs).foreach { i =>
          val t0 = System.nanoTime()
          val n = q(spark, dir).count()
          println(f"[probe] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
        }
      }
    spark.stop()
  }
}
