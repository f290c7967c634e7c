package graft

import graft.functions.Blas
import org.apache.spark.sql.functions._

/** Std.BLAS layer: per-row vector ops (codegen'd array HOFs) and the two
  * distributed GEMM schedules, which must agree cell-for-cell.
  */
class BlasSpec extends SparkSpec {
  import spark.implicits._

  test("per-row ops: daxpy/dscal/dasum/ddot/dnrm2 on known vectors") {
    val df = Seq((Array(1.0f, -2.0f, 3.0f), Array(10.0f, 20.0f, 30.0f)))
      .toDF("x", "y")
    val r = df.select(
      Blas.daxpy(2.0, col("x"), col("y")).as("axpy"),
      Blas.dscal(-1.0, col("x")).as("scal"),
      Blas.dasum(col("x")).as("asum"),
      Blas.ddot(col("x"), col("y")).as("dot"),
      Blas.dnrm2(col("y")).as("nrm")).head
    assert(r.getSeq[Double](0) == Seq(12.0, 16.0, 36.0))
    assert(r.getSeq[Double](1) == Seq(-1.0, 2.0, -3.0))
    assert(r.getDouble(2) == 6.0)
    assert(r.getDouble(3) == 60.0) // 10 - 40 + 90
    assert(math.abs(r.getDouble(4) - math.sqrt(1400.0)) < 1e-12)
  }

  test("trace and extract_diag address a column-major in-row matrix") {
    // 3x3 column-major: columns (1,2,3),(4,5,6),(7,8,9) → diag 1,5,9
    val m = Seq(Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0)).toDF("m")
    val r = m.select(Blas.trace(3, col("m")).as("t"),
      Blas.extractDiag(3, col("m")).as("d")).head
    assert(r.getDouble(0) == 15.0)
    assert(r.getSeq[Double](1) == Seq(1.0, 5.0, 9.0))
  }

  test("blocked GEMM equals coordinate GEMM, including non-divisible dims") {
    // 5x7 · 7x4 with a deterministic value pattern and some zeros
    val a = (for { i <- 0 until 5; k <- 0 until 7 if (i + k) % 3 != 0 }
      yield (i.toLong, k.toLong, (i * 7 + k + 1).toDouble)).toDF("i", "k", "v")
    val b = (for { k <- 0 until 7; j <- 0 until 4 if (k + j) % 4 != 1 }
      yield (k.toLong, j.toLong, (k - j).toDouble)).toDF("k", "j", "v")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
    val coord = asMap(Blas.dgemmCoord(a, b, alpha = 2.0))
    val blocked = asMap(Blas.dgemmBlocked(a, b, bs = 3, alpha = 2.0))
    // both schedules may surface exact-zero cells differently (blocked
    // drops all-zero tiles) — compare the non-zero support
    val coordNz = coord.filter(_._2 != 0.0)
    val blockedNz = blocked.filter(_._2 != 0.0)
    assert(blockedNz.keySet == coordNz.keySet)
    coordNz.foreach { case (ij, v) =>
      assert(math.abs(blockedNz(ij) - v) < 1e-9,
        s"cell $ij: $v vs ${blockedNz(ij)}")
    }
  }
}
