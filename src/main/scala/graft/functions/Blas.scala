package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Std.BLAS surface (reference `ecllibrary/std/BLAS.ecl` — `matrix_t` is a
  * per-record `SET OF REAL8`, evaluated row-by-row by a native plugin) plus
  * the distributed block layer its PBblas library builds on top.
  *
  * Two tiers, matching that split:
  *
  *  - **Per-row vector/matrix ops** (daxpy/dscal/dasum/ddot/dnrm2/trace/
  *    extract_diag) lower to Spark's codegen'd array higher-order functions
  *    (`transform`/`zip_with`/`aggregate`) — no UDF, stays inside
  *    whole-stage codegen, streams at scan speed over 100 TB.
  *  - **Distributed GEMM** over coordinate-form matrices `(i, k, v)`: the
  *    contraction is an equality join on the shared dimension `k` followed
  *    by a partial+final hash aggregate on `(i, j)` — both sides shuffle
  *    once on `k`, partial products combine map-side, never a cartesian.
  *    For dense 100 TB × 100 TB multiplies a block-partitioned schedule
  *    (each side shuffled into `bs×bs` tiles, tile-pair dense multiply)
  *    cuts the shuffled-row count by `bs`; [[dgemmBlocked]] provides it via
  *    per-tile array aggregation over the same join shape.
  *
  * All element arithmetic is REAL8 (double), like the reference's value_t.
  */
object Blas {

  private def d(c: Column): Column = c.cast("double")

  /** daxpy: alpha·x + y, element-wise over equal-length vectors. */
  def daxpy(alpha: Double, x: Column, y: Column): Column =
    zip_with(x, y, (xi, yi) => lit(alpha) * d(xi) + d(yi))

  /** dscal: alpha·x. */
  def dscal(alpha: Double, x: Column): Column =
    transform(x, xi => lit(alpha) * d(xi))

  /** dasum: Σ|xᵢ|. */
  def dasum(x: Column): Column =
    aggregate(x, lit(0.0), (acc, xi) => acc + abs(d(xi)))

  /** ddot: Σ xᵢ·yᵢ. */
  def ddot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (xi, yi) => d(xi) * d(yi)),
      lit(0.0), (acc, v) => acc + v)

  /** dnrm2: ‖x‖₂. */
  def dnrm2(x: Column): Column = sqrt(ddot(x, x))

  /** trace of an n×n column-major in-row matrix (BLAS.trace). */
  def trace(n: Int, m: Column): Column =
    aggregate(sequence(lit(0), lit(n - 1)),
      lit(0.0), (acc, i) => acc + d(element_at(m, i * (n + 1) + 1)))

  /** extract_diag of an n×n column-major in-row matrix. */
  def extractDiag(n: Int, m: Column): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => d(element_at(m, i * (n + 1) + 1)))

  /** Distributed GEMM on coordinate matrices: `a(i, k, v) · b(k, j, v)` →
    * `(i, j, c)`. Equality join on the contraction dimension + one hash
    * aggregate; `alpha` scales the result (dgemm's alpha, beta=0 form).
    */
  def dgemmCoord(a: DataFrame, b: DataFrame,
      alpha: Double = 1.0): DataFrame = {
    val prod = a.select(col("i"), col("k"), col("v").as("__av"))
      .join(b.select(col("k"), col("j"), col("v").as("__bv")), "k")
    prod.groupBy(col("i"), col("j"))
      .agg((lit(alpha) * sum(col("__av") * col("__bv"))).as("c"))
  }

  /** Block-scheduled GEMM: same contract as [[dgemmCoord]] but cells are
    * first packed into `bs×bs` tiles (one shuffle each side), tile pairs
    * meet on the shared block index, and each pair multiplies densely
    * inside one task. Shuffled rows drop from O(nnz) to O(nnz/bs²) tile
    * records; this is the PBblas discipline re-expressed as a DataFrame
    * plan. Tiles are sparse-safe: absent cells are zero.
    */
  def dgemmBlocked(a: DataFrame, b: DataFrame, bs: Int,
      alpha: Double = 1.0): DataFrame = {
    def tiles(df: DataFrame, rc: String, cc: String): DataFrame =
      df.groupBy((col(rc) / bs).cast("long").as("__br"),
          (col(cc) / bs).cast("long").as("__bc"))
        .agg(collect_list(struct(
          (col(rc) % bs).cast("int").as("r"),
          (col(cc) % bs).cast("int").as("c"),
          col("v").cast("double").as("v"))).as("__cells"))
    val at = tiles(a, "i", "k")
      .select(col("__br").as("__abr"), col("__bc").as("__abk"),
        col("__cells").as("__acells"))
    val bt = tiles(b, "k", "j")
      .select(col("__br").as("__bbk"), col("__bc").as("__bbc"),
        col("__cells").as("__bcells"))
    val mult = udf((ac: Seq[org.apache.spark.sql.Row],
        bc: Seq[org.apache.spark.sql.Row]) => {
      // dense tile-pair multiply: bs×bs accumulator, one pass per side
      val acc = new Array[Double](bs * bs)
      val bByRow = bc.groupBy(_.getInt(0))
      ac.foreach { cell =>
        val ar = cell.getInt(0); val akk = cell.getInt(1)
        val av = cell.getDouble(2)
        bByRow.getOrElse(akk, Nil).foreach { bcell =>
          acc(ar * bs + bcell.getInt(1)) += av * bcell.getDouble(2)
        }
      }
      acc.toIndexedSeq.zipWithIndex.collect {
        case (v, idx) if v != 0.0 => (idx / bs, idx % bs, v)
      }
    })
    at.join(bt, col("__abk") === col("__bbk"))
      .select(col("__abr"), col("__bbc"),
        explode(mult(col("__acells"), col("__bcells"))).as("__p"))
      .select((col("__abr") * bs + col("__p._1")).as("i"),
        (col("__bbc") * bs + col("__p._2")).as("j"), col("__p._3").as("__pp"))
      .groupBy(col("i"), col("j"))
      .agg((lit(alpha) * sum(col("__pp"))).as("c"))
  }
}
