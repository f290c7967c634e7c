package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** HASH32/HASH64 (ECL `no_hash/hash64`, `ecl/hql/hqlexpr.hpp:330-333`):
  * FNV-1a over the value's bytes. Implemented as native Catalyst
  * expressions with `doGenCode` so they participate in whole-stage codegen
  * (no UDF/serialization overhead in the hot path).
  */
object Fnv1a {
  final val Offset32 = 0x811c9dc5
  final val Prime32 = 0x01000193
  final val Offset64 = 0xcbf29ce484222325L
  final val Prime64 = 0x100000001b3L

  def hash32(bytes: Array[Byte]): Int = {
    var h = Offset32
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * Prime32; i += 1 }
    h
  }

  def hash64(bytes: Array[Byte]): Long = {
    var h = Offset64
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * Prime64; i += 1 }
    h
  }
}

case class Fnv1a32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ecl_hash32"

  override protected def nullSafeEval(v: Any): Any =
    Fnv1a.hash32(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv1a.hash32(($c).getBytes())")

  override protected def withNewChildInternal(c: Expression): Fnv1a32 = copy(c)
}

case class Fnv1a64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "ecl_hash64"

  override protected def nullSafeEval(v: Any): Any =
    Fnv1a.hash64(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv1a.hash64(($c).getBytes())")

  override protected def withNewChildInternal(c: Expression): Fnv1a64 = copy(c)
}
