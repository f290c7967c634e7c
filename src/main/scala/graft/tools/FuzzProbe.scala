package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition for q217_fuzzy_join (dev probe): times each plan
  * fragment of FuzzyJoin.editDistanceSelfJoin separately so the expensive
  * piece is identified by measurement, not guess.
  */
object FuzzProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[fuzz] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
    }

    val names = Tables.customer(spark, dir)
      .select(col("c_name").cast("string").as("nm"))
      .filter(col("nm").isNotNull).distinct()
    val sigs = names.select(col("nm"),
      explode(graft.ops.FuzzyJoin.deletionVariants(col("nm"), 1)).as("sig"))

    t("names.distinct")(names.count())
    t("sigs (explode variants)")(sigs.count())
    val joined = sigs.select(col("nm").as("a"), col("sig"))
      .join(sigs.select(col("nm").as("b"), col("sig")), Seq("sig"))
      .filter(col("a") < col("b"))
    t("join a<b")(joined.count())
    val dd = joined.select(col("a"), col("b")).distinct()
    t("join + distinct")(dd.count())
    val lev = dd.withColumn("dist", levenshtein(col("a"), col("b")))
      .filter(col("dist") <= 1)
    t("join + distinct + lev")(lev.count())
    t("full q217 (with orderBy)")(
      graft.ops.FuzzyJoin.editDistanceSelfJoin(
        Tables.customer(spark, dir), col("c_name"), 1)
        .orderBy(col("a"), col("b")).count())
    spark.stop()
  }
}
