package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap

/** Throwaway: per-job wall times inside one q150 profile run. */
object ProfileJobs {
  def main(a: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
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
    def in = graft.Tables.part(spark, dir)
      .select("p_partkey", "p_name", "p_brand", "p_size", "p_type")
    (1 to 3).foreach { i =>
      spans.clear()
      val t0 = System.nanoTime()
      val n = graft.analysis.DataPatterns.profile(in, withCorrelations = false).count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      val jobSum = { var s = 0.0; spans.forEach(x => s += x._3); s }
      println(f"[prof] run $i total=$total%.2f s jobs=${spans.size} jobSum=$jobSum%.2f driverGap=${total - jobSum}%.2f rows=$n")
      spans.forEach(x => println(f"[prof]   job ${x._1}%3d ${x._3}%6.2f s  ${x._2.take(90)}"))
    }
    spark.stop()
  }
}
