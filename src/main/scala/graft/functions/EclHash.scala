package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** HASH32/HASH64 (ECL `no_hash/no_hash64`, `ecl/hql/hqlexpr.hpp:330-333`):
  * FNV-1 over the value's bytes, exactly the reference's
  * `APPLY_FNV32/64` — multiply by the prime FIRST, then xor the byte
  * (`rtl/eclrtl/eclrtl.cpp:3817,3906`). String inputs are hashed with
  * TRAILING SPACES TRIMMED (`rtlHash32VStr` → `rtlTrimVStrLen`), matching
  * ECL's space-blind string semantics — so DISTRIBUTE(HASH32(k)) keys and
  * persisted hash values interoperate with the reference engine.
  *
  * Implemented as native Catalyst expressions with `doGenCode` so they
  * participate in whole-stage codegen (no UDF/serialization overhead).
  */
object EclHash {
  final val Offset32 = 0x811c9dc5
  final val Prime32 = 0x01000193
  final val Offset64 = 0xcbf29ce484222325L
  final val Prime64 = 0x100000001b3L

  private def trimmedLen(bytes: Array[Byte]): Int = {
    var n = bytes.length
    while (n > 0 && bytes(n - 1) == ' ') n -= 1
    n
  }

  def hash32(bytes: Array[Byte], len: Int): Int = {
    var h = Offset32
    var i = 0
    while (i < len) { h = h * Prime32; h ^= (bytes(i) & 0xff); i += 1 }
    h
  }

  def hash64(bytes: Array[Byte], len: Int): Long = {
    var h = Offset64
    var i = 0
    while (i < len) { h = h * Prime64; h ^= (bytes(i) & 0xff); i += 1 }
    h
  }

  /** String hash: FNV-1 over the UTF-8 bytes, trailing spaces trimmed. */
  def hash32Str(s: UTF8String): Int = {
    val b = s.getBytes
    hash32(b, trimmedLen(b))
  }

  def hash64Str(s: UTF8String): Long = {
    val b = s.getBytes
    hash64(b, trimmedLen(b))
  }
}

case class EclHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ecl_hash32"

  override protected def nullSafeEval(v: Any): Any =
    EclHash.hash32Str(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EclHash.hash32Str($c)")

  override protected def withNewChildInternal(c: Expression): EclHash32 = copy(c)
}

case class EclHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "ecl_hash64"

  override protected def nullSafeEval(v: Any): Any =
    EclHash.hash64Str(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EclHash.hash64Str($c)")

  override protected def withNewChildInternal(c: Expression): EclHash64 = copy(c)
}
