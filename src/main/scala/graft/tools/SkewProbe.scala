package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproduces PlanAuditSpec's AQE skew-split pin outside the suite, to
  * root-cause the full-suite-only first-attempt misses (r15 verdict
  * What's-wrong #1). Mirrors TestSpark exactly (local[4], 4 shuffle
  * partitions) and optionally runs N background threads hammering the
  * shared scheduler with small shuffle jobs — the suspected interaction
  * (SCALE_NOTES: misses correlate with full-suite runs, never isolated).
  *
  * Usage: SkewProbe [iterations=20] [noiseThreads=0]
  * Prints one line per iteration: HIT / MISS; on MISS dumps the final
  * plan section so the decisive AQE state is captured from the failing
  * execution itself (not a re-run).
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(20)
    val noiseThreads = args.lift(1).map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("skew-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var stop = false
    val noise = (1 to noiseThreads).map { i =>
      val t = new Thread(() => {
        val s = spark.newSession()
        while (!stop) {
          // small shuffle jobs, like a neighbouring suite's queries
          s.range(200000).groupBy((col("id") % 97).as("k")).count()
            .agg(sum("count")).collect()
          ()
        }
      }, s"noise-$i")
      t.setDaemon(true); t.start(); t
    }

    var misses = 0
    (1 to iters).foreach { i =>
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      s2.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1024")
      // mirror the pin (r16): decision bound to the byte threshold alone
      s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512")
      val hot = 2000
      val docs = hot + 200
      val sets = s2.range(docs).select(col("id").as("doc_id"),
        expr("transform(sequence(1, 8), x -> concat('shingle_', id, '_', x))")
          .as("sset"))
      val bands = s2.range(docs).select(col("id").as("doc_id"),
        lit(0L).as("band"),
        expr(s"CASE WHEN id < $hot THEN 'hot' " +
          s"ELSE concat('b', id % 100) END").as("bk"))
      val df = graft.text.TextOps.lshJaccardPairs(bands, sets, 0.0)
      val t0 = System.nanoTime()
      val pairs = df.queryExecution.executedPlan.execute().count()
      val ms = (System.nanoTime() - t0) / 1000000
      require(pairs == hot.toLong * (hot - 1) / 2 + 100, s"pairs=$pairs")
      val plan = df.queryExecution.executedPlan.toString
      require(plan.contains("isFinalPlan=true"))
      val finalSection = plan.split("== Initial Plan ==").head
      val ok = finalSection.contains("skew=true")
      if (!ok) {
        misses += 1
        println(s"iter $i: MISS (${ms}ms) ---- final plan:\n$finalSection\n----")
      } else println(s"iter $i: HIT (${ms}ms, " +
        s"smj-skew=${"skew=true".r.findAllIn(finalSection).size})")
    }
    stop = true
    noise.foreach(_.interrupt())
    println(s"DONE: $misses/$iters misses (noise=$noiseThreads)")
    spark.stop()
  }
}
