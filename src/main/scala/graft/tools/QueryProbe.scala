package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** The one parameterized timing probe for named queries (dev tool):
  *
  * `runMain graft.tools.QueryProbe <prefixes> [runs] [bench]`
  *
  *  - `prefixes`: comma-separated query-name prefixes (exact sequences
  *    also work — `q86,q92b` — so ordering experiments and bisecting a
  *    shared-JVM slowdown are just an argument list)
  *  - `runs`: timings per query (default 3); the LAST run is the JIT-warm
  *    engine number — first runs in a fresh JVM can be several times
  *    slower while codegen compiles
  *  - `bench`: apply Bench's session config (64 MiB broadcast threshold)
  *    to reproduce driver-bench numbers, including its cold first run
  *
  * against `SPARK_GRAFT_SF_DIR` (default sf0.1).
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val prefixes = (if (args.nonEmpty) args(0) else "q01").split(',')
    val runs = if (args.length > 1) args(1).toInt else 3
    val benchConf = args.length > 2 && args(2) == "bench"
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = (if (benchConf)
      builder.config("spark.sql.autoBroadcastJoinThreshold",
        (64L << 20).toString)
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // prefixes are probed IN ARGUMENT ORDER (each expanding alphabetically)
    // so "a,b,a" measures whether running b degrades a in a shared JVM
    val byName = SparkEntry.queries.toSeq.sortBy(_._1)
    prefixes.flatMap(p => byName.filter(_._1.startsWith(p)))
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
