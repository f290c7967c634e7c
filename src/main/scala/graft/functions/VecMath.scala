package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen-participating vector arithmetic for the embedding hot path.
  *
  * The double-precision production mode (round 12) moved the embedding
  * ops off DecimalType, but the folds still ran through Catalyst
  * higher-order functions (`aggregate`/`zip_with`/`transform`), which are
  * interpreted per ELEMENT — a closure dispatch and boxed accumulator for
  * every multiply-add. At the sf10 rehearsal the IVF assignment alone is
  * ~10¹⁰ multiply-adds; that overhead is the whole cost. These
  * expressions do the identical arithmetic as a tight JVM loop invoked
  * once per ROW from whole-stage-generated code (the [[EclHash]]
  * static-helper pattern), so the JIT vectorizes it.
  *
  * Numeric contract — IDENTICAL results to the HOF formulation they
  * replace, not merely close: ascending-index fold of
  * `(double)l(i) * (double)r(i)` into a double accumulator is the same
  * IEEE operation sequence as `aggregate(zip_with(...), 0.0, _+_)`.
  * Null/length semantics follow the `coalesce(x*y, 0)` shape the callers
  * already used: null elements and positions past the shorter array
  * contribute zero. (The decimal `exact = true` oracle paths never route
  * here.)
  */
object VecMath {

  private def get(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Zero-filling dot product; fl/fr flag float (vs double) elements.
    * The flags are compile-time constants in the generated call site, so
    * the JIT specializes the loop.
    */
  def dot(l: ArrayData, fl: Boolean, r: ArrayData, fr: Boolean): Double = {
    val n = math.min(l.numElements(), r.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!l.isNullAt(i) && !r.isNullAt(i))
        acc += get(l, fl, i) * get(r, fr, i)
      i += 1
    }
    acc
  }

  /** All dots of `vec` against the rows of `mat`
    * (array<array<float|double>>), one output per row — the
    * IVF-assignment kernel. `fr` flags the INNER element type of the
    * matrix rows (a float matrix read as doubles would silently
    * reinterpret 4-byte storage as 8-byte values). Null matrix rows
    * yield 0 (they cannot occur from the literal builders).
    */
  def matDots(vec: ArrayData, fv: Boolean, mat: ArrayData,
      fr: Boolean): ArrayData = {
    val c = mat.numElements()
    val out = new Array[Double](c)
    var j = 0
    while (j < c) {
      out(j) =
        if (mat.isNullAt(j)) 0.0
        else dot(vec, fv, mat.getArray(j), fr)
      j += 1
    }
    new GenericArrayData(out)
  }

  private[functions] def isFloatArray(e: Expression): Boolean =
    e.dataType match {
      case ArrayType(FloatType, _) => true
      case ArrayType(DoubleType, _) => false
      case other => throw new IllegalArgumentException(
        s"expected array<float|double>, got $other")
    }

  /** Inner-element float flag of an array<array<float|double>> operand. */
  private[functions] def isFloatMatrix(e: Expression): Boolean =
    e.dataType match {
      case ArrayType(ArrayType(FloatType, _), _) => true
      case ArrayType(ArrayType(DoubleType, _), _) => false
      case other => throw new IllegalArgumentException(
        s"expected array<array<float|double>>, got $other")
    }

  private[functions] def vecTypeOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  private[functions] def matTypeOk(t: DataType): Boolean = t match {
    case ArrayType(inner, _) => vecTypeOk(inner)
    case _ => false
  }
}

/** `dot(left, right)` as one codegen'd call per row (see [[VecMath]]). */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private lazy val fl = VecMath.isFloatArray(left)
  private lazy val fr = VecMath.isFloatArray(right)

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecMath.vecTypeOk(left.dataType) && VecMath.vecTypeOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<float|double>, array<float|double>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecMath.dot(l.asInstanceOf[ArrayData], fl, r.asInstanceOf[ArrayData], fr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.VecMath.dot($l, $fl, $r, $fr)")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): VecDot = copy(left = l, right = r)
}

/** `vec · every row of mat` → array<double> (see [[VecMath.matDots]]). */
case class VecMatDots(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_mat_dots"

  private lazy val fv = VecMath.isFloatArray(left)
  private lazy val fr = VecMath.isFloatMatrix(right)

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecMath.vecTypeOk(left.dataType) && VecMath.matTypeOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_mat_dots expects (array<float|double>, " +
        s"array<array<float|double>>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(v: Any, m: Any): Any =
    VecMath.matDots(v.asInstanceOf[ArrayData], fv, m.asInstanceOf[ArrayData],
      fr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, m) =>
      s"graft.functions.VecMath.matDots($v, $fv, $m, $fr)")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): VecMatDots = copy(left = l, right = r)
}
