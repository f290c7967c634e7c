package graft.tools

import graft.Tables
import graft.text.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the q99 shape (dev tool): splits the
  * near-dup component pipeline into candidate generation (shingle →
  * minhash → LSH → jaccard refine) and the connected-components rounds,
  * and times each star round individually with its edge count — so a
  * "q99 is slow at sfN" report can be attributed to a specific stage
  * instead of the composite.
  *
  * `runMain graft.tools.CcProbe` against `SPARK_GRAFT_SF_DIR`.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.workflow.Workflow.checkpointEager

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sets = graft.ops.Shape.split(TextOps.shingleSet(
      Tables.documents(spark, dir), col("doc_id"), col("text"), 3))
    timed("stage 1: shingle sets (persist)") {
      println(s"[cc]   docs with shingles: ${sets.count()}")
    }
    val bands = graft.ops.Shape.split(
      TextOps.lshBandKeys(TextOps.minhashSig(sets, 8), 8, 2))
    timed("stage 2: minhash sigs + band keys (persist)") {
      println(s"[cc]   band rows: ${bands.count()}")
    }
    val cands = timed("stage 3: LSH bucket self-join (distinct pairs)")(
      checkpointEager(TextOps.lshCandidates(bands)))
    println(s"[cc]   candidate pairs: ${cands.df.count()}")

    // lshJaccardPairs routes hot buckets at execution time (no eager
    // probe since r14); construction is cheap but keep it in the block
    val e0 = timed("stage 4: jaccard refine (bucket-local fused)")(
      checkpointEager(TextOps.lshJaccardPairs(bands, sets, 0.5)
      .select(col("doc_a").cast("long").as("u"),
        col("doc_b").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()))
    var e = e0
    var eCount = timed("edge count")(e.df.count())
    println(s"[cc] initial edges: $eCount")
    var converged = false
    var rounds = 0
    while (!converged && rounds < 30) {
      val ls = timed(s"round $rounds largeStar")(
        checkpointEager(graft.ops.Graph.largeStar(e.df)))
      val next = timed(s"round $rounds smallStar")(
        checkpointEager(graft.ops.Graph.smallStar(ls.df)))
      val nextCount = next.df.count()
      ls.release()
      converged = timed(s"round $rounds fixpoint test")(
        eCount == nextCount &&
          next.df.join(e.df, Seq("u", "v"), "left_anti").isEmpty)
      e.release()
      println(s"[cc] round $rounds edges: $nextCount converged=$converged")
      eCount = nextCount
      e = next
      rounds += 1
    }
    spark.stop()
  }
}
