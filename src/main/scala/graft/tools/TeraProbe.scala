package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone terasort scale probe (dev tool): `runMain
  * graft.tools.TeraProbe <nRecords> [runs]` — times the full
  * generate → sort → validate pipeline (the q224 certificate) at an
  * arbitrary record count, beyond what any materialized SF directory
  * provides. Prints per-run seconds and rows/s; the scale contract is
  * CONSTANT per-row throughput across decades (SCALE_NOTES).
  */
object TeraProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 240000000L
    val runs = if (args.length > 1) args(1).toInt else 1
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val row = graft.ops.TeraSort.run(spark, n).collect().head
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[teraprobe] n=$n run $i: $sec%.1f s  " +
        f"${n / sec / 1e6}%.2f M rows/s  sorted_ok=${row.getBoolean(1)}  " +
        s"checksum=(${row.getLong(2)},${row.getLong(3)})")
    }
    spark.stop()
  }
}
