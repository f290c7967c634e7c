package graft

import graft.sources.{IndexedTable, ZOrder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Z-order layout: interleave correctness on hand points, and the claim
  * that justifies the operator — MEASURED row-group skipping on a
  * second-key predicate, where a single-key sorted layout reads
  * everything.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave puts bit b of column i at position b*k+i") {
    val df = Seq((3L, 1L)).toDF("a", "b")
      .select(ZOrder.interleave(Seq(col("a"), col("b"))).as("z"))
    // a=0b11 contributes bits 0,2; b=0b01 contributes bit 1 → z=0b111
    assert(df.collect().head.getLong(0) == 7L)
  }

  test("interleave is monotone in each dimension on a fixed grid") {
    val df = Seq((1L, 5L), (2L, 5L), (1L, 6L)).toDF("a", "b")
      .select(ZOrder.interleave(Seq(col("a"), col("b"))).as("z"))
    val Seq(z11, z21, z12) = df.collect().toSeq.map(_.getLong(0))
    assert(z21 > z11 && z12 > z11)
  }

  test("4-key interleave never reaches the long sign bit (z stays " +
      "non-negative, so the signed range sort follows curve order)") {
    // max 15-bit grid value in all four dims — the worst case that, at
    // 16 bits/column, would put column 3's top bit at position 63
    val mx = (1L << 15) - 1
    val df = Seq((mx, mx, mx, mx)).toDF("a", "b", "c", "d")
      .select(ZOrder.interleave(
        Seq(col("a"), col("b"), col("c"), col("d"))).as("z"))
    val z = df.collect().head.getLong(0)
    assert(z >= 0L, s"sign bit set: $z")
    assert(z == (1L << 60) - 1) // 15 bits × 4 columns, all ones
  }

  /** Rows the scan emitted (post row-group skipping) for a count over
    * `pred` on the parquet at `path`.
    */
  private def scannedRows(path: String, pred: org.apache.spark.sql.Column): Long = {
    val df = spark.read.parquet(path).filter(pred)
    // execute THIS plan object (df.count() would build and run a separate
    // aggregate plan, leaving these metrics untouched)
    df.queryExecution.executedPlan.execute().count()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans)
      }
    scans(df.queryExecution.executedPlan).map(_.metrics("numOutputRows").value).sum
  }

  private val n = 200000
  private lazy val built: (String, String) = {
    val base = spark.range(n).select(
      (col("id") % 443).as("a"), // co-prime strides decorrelate the keys
      (col("id") % 631).as("b"),
      col("id").as("v"))
    val zPath = "target/graft_io/zorder_skip_z"
    val sPath = "target/graft_io/zorder_skip_s"
    ZOrder.build(base, Seq("a", "b"), zPath, numPartitions = 32)
    IndexedTable.build(base, Seq("a"), sPath, numPartitions = 32)
    (zPath, sPath)
  }

  test("second-key predicate: z-ordered layout skips row groups a " +
      "single-key sort cannot") {
    val (zPath, sPath) = built
    val base = spark.read.parquet(zPath)
    // per-file parquet min/max is the skipping granularity under test:
    // one row group per file here (200k rows / 32 files)
    val pred = col("b").between(100, 120) // selective on the NON-sort key
    val zRows = scannedRows(zPath, pred)
    val sRows = scannedRows(sPath, pred)
    val matches = base.filter(col("b").between(100, 120)).count()
    // the a-sorted layout scatters b uniformly: no skipping, full scan
    assert(sRows == n.toLong, s"expected full scan, got $sRows")
    // the z-layout clusters b at every curve level: big skip factor
    assert(zRows <= n / 2, s"z-order skipped nothing: $zRows of $n")
    assert(zRows >= matches, "scan cannot emit fewer rows than match")
    info(s"z-order scanned $zRows rows vs $sRows linear (${matches} match)")
  }

  test("both-key box predicate also prunes on the z layout") {
    val (zPath, _) = built
    val pred = col("a").between(0, 40) && col("b").between(0, 40)
    val zRows = scannedRows(zPath, pred)
    assert(zRows <= n / 2, s"no pruning for box predicate: $zRows")
  }
}
