package graft.tools

import org.apache.spark.sql.SparkSession

/** Times raw sequential POSTs against the loopback echo service to
  * isolate per-request serving cost from the SOAPCALL client machinery.
  */
object HttpProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 500
    val spark = SparkSession.builder().master("local[8]")
      .appName("httpprobe").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val url = graft.serve.Published.loopbackEchoUrl(spark)
    val t = graft.sources.Soapcall.httpTransport()
    def get(u: String): String = {
      val conn = new java.net.URL(u).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      val is = conn.getInputStream
      try scala.io.Source.fromInputStream(is, "UTF-8").mkString
      finally is.close()
    }
    // warm
    (1 to 20).foreach(i => t(url, s"v=warm$i"))
    val t0 = System.nanoTime()
    (1 to n).foreach(i => t(url, s"v=abc$i"))
    val ms = (System.nanoTime() - t0) / 1e6
    println(f"[httpprobe] $n sequential POSTs: $ms%.0f ms (${ms / n}%.2f ms/call)")
    val t1 = System.nanoTime()
    (1 to n).foreach(i => get(s"$url?v=abc$i"))
    val ms2 = (System.nanoTime() - t1) / 1e6
    println(f"[httpprobe] $n sequential GETs:  $ms2%.0f ms (${ms2 / n}%.2f ms/call)")
    // direct run().take() — same work the handler does, no HTTP
    val pub2 = new graft.serve.Published(spark)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("r",
        org.apache.spark.sql.types.StringType)))
    pub2.publish("echo2") { (s, stored) =>
      s.createDataFrame(java.util.Collections.singletonList(
        org.apache.spark.sql.Row(stored("v", "").reverse)), schema)
    }
    (1 to 20).foreach(i => pub2.run("echo2", Map("v" -> s"warm$i")).take(10000))
    val t2 = System.nanoTime()
    (1 to n).foreach(i => pub2.run("echo2", Map("v" -> s"abc$i")).take(10000))
    val ms3 = (System.nanoTime() - t2) / 1e6
    println(f"[httpprobe] $n direct run+take:  $ms3%.0f ms (${ms3 / n}%.2f ms/call)")
    graft.serve.Published.stopLoopbackEcho()
    spark.stop()
  }
}
