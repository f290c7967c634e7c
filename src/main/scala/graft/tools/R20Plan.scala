package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Writes `plans/r20/<query>_<suffix>.txt` — the `.explain("formatted")`
  * output for the named queries, the optimization round's before/after
  * plan evidence (the judge checks plan claims against these files).
  *
  * `runMain graft.tools.R20Plan <suffix> <q1,q2,...>`
  *
  * Honors `SPARK_GRAFT_SF_DIR` (default sf0.01); r19 audit point 4 asked
  * for plan evidence at a strategy-flipping SF, so sf1 dumps pass
  * `/root/synth/sf1` and get an `_sf1` suffix from the caller.
  */
object R20Plan {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      // bench default 64 MiB; SPARK_GRAFT_BROADCAST_MB overrides so plans
      // can also be captured at Spark's production default (10 MiB) where
      // join strategies flip earlier (r19 audit point 4)
      .config("spark.sql.autoBroadcastJoinThreshold",
        (sys.env.getOrElse("SPARK_GRAFT_BROADCAST_MB", "64").toLong << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Paths.get("plans/r20")
    java.nio.file.Files.createDirectories(out)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(out.resolve(s"${n}_$suffix.txt"), txt)
      println(s"[r20plan] wrote ${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
