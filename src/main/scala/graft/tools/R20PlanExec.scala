package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Like R20Plan, but for queries whose interesting plans are INTERNAL
  * actions (e.g. q150's profile() runs an eager wide aggregate and a
  * counts collect before building its output): a QueryExecutionListener
  * records the formatted plan of EVERY action executed while the query
  * builds + runs, so the evidence file shows the operators that actually
  * carry the cost, not just the final output projection.
  *
  * `runMain graft.tools.R20PlanExec <suffix> <q1,q2,...>`
  */
object R20PlanExec {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Paths.get("plans/r20")
    java.nio.file.Files.createDirectories(out)
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        plans.add(s"== action: $funcName (${durationNs / 1000000} ms) ==\n" +
          qe.explainString(org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")))
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    names.foreach { n =>
      plans.clear()
      val df = SparkEntry.queries(n)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      // listener events are posted asynchronously
      Thread.sleep(1500)
      val sb = new StringBuilder
      sb.append(s"== $n: executed plans of every action (build + run) ==\n\n")
      plans.forEach(p => { sb.append(p); sb.append("\n\n") })
      java.nio.file.Files.writeString(out.resolve(s"${n}_$suffix.txt"),
        sb.toString)
      println(s"[r20planexec] wrote ${n}_$suffix.txt (${sb.length} chars, " +
        s"${plans.size} actions)")
    }
    spark.stop()
  }
}
