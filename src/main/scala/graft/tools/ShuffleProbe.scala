package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Executes named queries and prints each shuffle exchange's row/byte
  * metrics from the EXECUTED (AQE-final) plan — the guide §2.3 evidence
  * for "shuffle fewer bytes" claims that wall-clock on a local[32] box
  * cannot show (local shuffles are disk writes, not NIC crossings).
  *
  * `runMain graft.tools.ShuffleProbe <q1,q2,...> [runs]` against
  * `SPARK_GRAFT_SF_DIR`.
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    val runs = if (args.length > 1) args(1).toInt else 2
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val here = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case other => other.children.flatMap(walk)
      }
      p +: here
    }
    names.foreach { n =>
      val byName = SparkEntry.queries
      val fn = byName(n)
      (1 to runs).foreach { i =>
        val df = fn(spark, dir)
        val t0 = System.nanoTime()
        // execute THIS QueryExecution (df.count() would build its own and
        // leave these metrics untouched); toRdd.count computes every row
        val rows = df.queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val plan = df.queryExecution.executedPlan
        val shuffles = walk(plan).collect { case s: ShuffleExchangeLike => s }
        println(f"[shuffle] $n run $i: $sec%.2f s rows=$rows shuffles=${shuffles.size}")
        shuffles.zipWithIndex.foreach { case (s, j) =>
          val m = s.metrics
          def g(k: String): String =
            m.get(k).map(_.value.toString).getOrElse("-")
          println(s"[shuffle]   ex$j dataSize=${g("dataSize")} " +
            s"shuffleRecordsWritten=${g("shuffleRecordsWritten")} " +
            s"bytesWritten=${g("shuffleBytesWritten")}")
        }
      }
    }
    spark.stop()
  }
}
