package graft

import graft.text.Embeddings
import org.apache.spark.sql.functions._

/** Codegen vector kernels: bit-identical to the HOF folds they replace
  * (same IEEE operation sequence), zero-fill semantics, and actual
  * participation in whole-stage codegen.
  */
class VecMathSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(0.5f, -1.25f, 3.0f, 0.125f), Array(2.0f, 0.5f, -1.0f, 4.0f)),
    (2L, Array(1e30f, 1.0f, -1e30f, 1.0f), Array(1.0f, 1.0f, 1.0f, 1.0f)),
    (3L, Array(0f, 0f, 0f, 0f), Array(9f, 9f, 9f, 9f))
  ).toDF("id", "a", "b")

  test("VecDot == the interpreted HOF double fold, bit for bit") {
    // same ascending-index multiply-add sequence → identical doubles,
    // including the catastrophic-cancellation row (1e30 + 1 - 1e30 + 1)
    val got = vecs.select(col("id"), Embeddings.dot(col("a"), col("b")).as("d"))
      .as[(Long, Double)].collect().toMap
    val hof = vecs.select(col("id"),
        aggregate(zip_with(col("a"), col("b"),
          (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x).as("d"))
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == hof.keySet)
    got.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToRawLongBits(v) ==
        java.lang.Double.doubleToRawLongBits(hof(k)), s"row $k: $v != ${hof(k)}")
    }
  }

  test("zero-fill semantics: length mismatch and null elements contribute 0") {
    val df = Seq((1L, Seq(Some(2.0f), None, Some(3.0f)), Seq(4.0f)))
      .toDF("id", "a", "b")
    // only position 0 overlaps and is non-null: 2*4 = 8
    val d = df.select(Embeddings.dot(col("a"), col("b")))
      .collect().head.getDouble(0)
    assert(d == 8.0)
    // null ARRAY (not element) still nulls the result
    val dn = df.select(Embeddings.dot(lit(null).cast("array<float>"), col("b")))
      .collect().head
    assert(dn.isNullAt(0))
  }

  test("norm/planeProj routes: double mode == decimal mode on clean data") {
    // row 2's 1e30 components overflow the decimal path's scale-12 cast
    // by design — the exact mode is for embedding-magnitude data
    val n = vecs.filter(col("id") =!= 2)
      .select(Embeddings.norm(col("a")).as("n"),
        Embeddings.norm(col("a"), exact = true).as("ne"))
      .collect()
    n.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("VecMatDots == per-centroid VecDot, double and float vectors") {
    val mat = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.5, 0.5, -0.5, 0.25))
    val got = vecs.select(col("id"),
        org.apache.spark.sql.GraftBridge.column(graft.functions.VecMatDots(
          org.apache.spark.sql.GraftBridge.expression(col("a")),
          org.apache.spark.sql.GraftBridge.expression(typedLit(mat)))).as("d"))
      .as[(Long, Seq[Double])].collect().toMap
    val single = vecs.select(col("id"),
        Embeddings.dot(col("a"), typedLit(mat.head)).as("d0"),
        Embeddings.dot(col("a"), typedLit(mat(1))).as("d1"))
      .as[(Long, Double, Double)].collect().map(t => t._1 -> Seq(t._2, t._3)).toMap
    assert(got == single)
  }

  test("SQL registry: vec_dot / vec_mat_dots callable from spark.sql") {
    graft.functions.Register.all(spark)
    vecs.createOrReplaceTempView("vm_vecs")
    val d = spark.sql(
      "SELECT id, vec_dot(a, b) AS d FROM vm_vecs WHERE id = 1")
      .collect().head.getDouble(1)
    // 0.5*2 + (-1.25)*0.5 + 3*(-1) + 0.125*4 = 1 - 0.625 - 3 + 0.5
    assert(d == 0.5 * 2 + -1.25 * 0.5 + 3.0 * -1.0 + 0.125 * 4.0)
    val m = spark.sql(
      "SELECT vec_mat_dots(a, array(array(1.0d, 0d, 0d, 0d))) AS ds " +
        "FROM vm_vecs WHERE id = 3")
      .collect().head.getSeq[Double](0)
    assert(m == Seq(0.0))
  }

  test("VecMatDots reads a FLOAT matrix correctly (4-byte storage, not " +
      "reinterpreted as doubles) and rejects non-vector operand types " +
      "at analysis time") {
    graft.functions.Register.all(spark)
    vecs.createOrReplaceTempView("vm_vecs")
    // float matrix: values chosen exactly representable → results equal
    // the double-matrix formulation bit for bit
    val f = spark.sql(
      "SELECT vec_mat_dots(a, array(CAST(array(1.0, 0, 0, 0) AS " +
        "array<float>), CAST(array(0.5, 0.5, -0.5, 0.25) AS " +
        "array<float>))) AS ds FROM vm_vecs WHERE id = 1")
      .collect().head.getSeq[Double](0)
    assert(f == Seq(0.5, -1.84375), s"float matrix misread: $f")
    // wrong operand type must fail at ANALYSIS, not produce garbage
    val err = intercept[Exception] {
      spark.sql("SELECT vec_mat_dots(a, array(array(1, 2, 3, 4))) " +
        "FROM vm_vecs").collect()
    }
    assert(err.getMessage.contains("vec_mat_dots") ||
      err.getMessage.toLowerCase.contains("type"),
      s"unexpected error: ${err.getMessage}")
    val err2 = intercept[Exception] {
      spark.sql("SELECT vec_dot(a, array(1, 2, 3, 4)) FROM vm_vecs")
        .collect()
    }
    assert(err2.getMessage.contains("vec_dot") ||
      err2.getMessage.toLowerCase.contains("type"))
  }

  test("golden vectors: pinned IEEE ascending-fold results — any future " +
      "reordering (SIMD, JIT, codegen change) fails loudly") {
    // a=(0.5,-1.25,3.0,0.125)f: exact binary values, products exact
    //   r0=(1,0,0,0)    → 0.5
    //   r1=(.5,.5,-.5,.25) → 0.25 - 0.625 - 1.5 + 0.03125 = -1.84375
    // cancellation row a=(1e30,1,-1e30,1)f · (1,1,1,1):
    //   ascending fold: (1e30 + 1) absorbs to 1e30, -1e30 → 0, +1 → 1.0
    //   (a reordered fold — e.g. pairwise (1e30-1e30)+(1+1) — gives 2.0)
    val mat = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.5, 0.5, -0.5, 0.25))
    val got = vecs.select(col("id"),
        org.apache.spark.sql.GraftBridge.column(graft.functions.VecMatDots(
          org.apache.spark.sql.GraftBridge.expression(col("a")),
          org.apache.spark.sql.GraftBridge.expression(typedLit(mat)))).as("d"),
        Embeddings.dot(col("a"), col("b")).as("s"))
      .as[(Long, Seq[Double], Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
    assert(got(1L)._1.map(bits) == Seq(0.5, -1.84375).map(bits),
      s"golden matDots drifted: ${got(1L)._1}")
    assert(bits(got(2L)._2) == bits(1.0),
      s"golden cancellation dot drifted: ${got(2L)._2} (expected 1.0 — " +
        "a value of 2.0 means the fold was reordered)")
  }

  test("the kernel runs inside whole-stage codegen (no interpreted HOF " +
      "in the production dot path)") {
    // build arrays from a range column so the projection cannot collapse
    // to a LocalTableScan (literal-only frames constant-fold away)
    val df = spark.range(100).select(
      array(col("id").cast("float"), (col("id") * 2).cast("float")).as("a"),
      array(lit(1.0f), lit(2.0f)).as("b"))
    val plan = df.select(Embeddings.dot(col("a"), col("b")).as("d"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix is the whole-stage-codegen span marker
    assert(plan.contains("*(1) Project"), s"projection not codegen'd:\n$plan")
    assert(plan.contains("vec_dot"), s"kernel not in plan:\n$plan")
    assert(!plan.contains("lambdafunction"),
      s"interpreted HOF fold still present:\n$plan")
  }
}
