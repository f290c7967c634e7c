package graft.tools

import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Dev tool: per-job wall times inside one declared query's run — attributes
  * a composite query's cost to its jobs (fixpoint rounds, checkpoints,
  * collects) instead of the opaque total.
  *
  * `runMain graft.tools.JobsProbe <queryName> [runs]` against
  * `SPARK_GRAFT_SF_DIR` (default sf0.1), bench-shaped session.
  */
object JobsProbe {
  def main(a: Array[String]): Unit = {
    val name = a(0)
    val runs = if (a.length > 1) a(1).toInt else 3
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = TrieMap[Int, (Long, String)]()
    val spans = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts(js.jobId) = (System.nanoTime(),
          js.stageInfos.map(_.name.takeWhile(_ != '(')).distinct.mkString("+"))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, n) =>
          spans.add((je.jobId, n, (System.nanoTime() - t0) / 1e9)) }
    })
    (1 to runs).foreach { i =>
      spans.clear()
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      val jobSum = { var s = 0.0; spans.forEach(x => s += x._3); s }
      println(f"[jobs] $name run $i total=$total%.2f s jobs=${spans.size} jobSum=$jobSum%.2f driverGap=${total - jobSum}%.2f")
      if (i == runs) {
        val sorted = new java.util.ArrayList[(Int, String, Double)]()
        spans.forEach(x => sorted.add(x))
        sorted.sort((x, y) => Integer.compare(x._1, y._1))
        sorted.forEach(x => println(f"[jobs]   job ${x._1}%3d ${x._3}%6.2f s  ${x._2.take(100)}"))
      }
    }
    spark.stop()
  }
}
