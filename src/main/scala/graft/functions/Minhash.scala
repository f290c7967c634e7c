package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature kernel: per document,
  * `sig[i] = min over the shingle set of md5("<i>|" + shingle)` as a
  * lowercase-hex string — the exact values of the HOF formulation
  *
  * {{{ transform(sequence(0, n-1), i =>
  *       array_min(transform(sset, s => md5(concat(i, '|', s))))) }}}
  *
  * which the DuckDB oracles reproduce literally. The HOF runs interpreted
  * per ELEMENT (higher-order functions never enter whole-stage codegen):
  * every md5 call instantiates a fresh MessageDigest, materializes a
  * 32-char hex UTF8String, and the min-fold compares hex text. At the
  * sf10 rehearsal that is 500 k docs × ~100 shingles × 8 seeds ≈ 4×10⁸
  * digests — 341 s of the near-dup family's cold path. This kernel does
  * the identical digests in one JVM loop per ROW: one reused
  * MessageDigest, raw 16-byte unsigned compares for the min (hex
  * lexicographic order over 0-9a-f IS the unsigned byte order of the
  * digest, so the winner is the same string), and hex-encodes only the
  * per-seed winners.
  *
  * Null semantics match the HOF: null shingles are skipped (`array_min`
  * ignores null inputs); a set with no non-null shingles yields null
  * signature elements. Callers guarantee non-empty sets
  * (`shingleSet` filters `size > 0`).
  */
object Minhash {

  private val hexDigits = "0123456789abcdef".toCharArray

  /** True iff a < b under unsigned byte order (equal-length digests). */
  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** One row's signature: array of numHashes lowercase-hex md5 minima. */
  def sig(sset: ArrayData, numHashes: Int): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[Array[Byte]](numHashes)
    val seedPrefix = Array.tabulate(numHashes)(h =>
      (String.valueOf(h) + "|").getBytes("UTF-8"))
    val n = sset.numElements()
    var i = 0
    while (i < n) {
      if (!sset.isNullAt(i)) {
        val s = sset.getUTF8String(i).getBytes
        var h = 0
        while (h < numHashes) {
          md.reset()
          md.update(seedPrefix(h))
          md.update(s)
          val d = md.digest()
          if (mins(h) == null || unsignedLess(d, mins(h))) mins(h) = d
          h += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    var h = 0
    while (h < numHashes) {
      out(h) = if (mins(h) == null) null else hex(mins(h))
      h += 1
    }
    new GenericArrayData(out)
  }
}

/** `minhash_sig(sset)` with a plan-time seed count — see [[Minhash]]. */
case class MinhashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1 && numHashes <= 1024,
    s"numHashes must be in [1, 1024], got $numHashes")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${other.sql}")
  }

  override protected def nullSafeEval(a: Any): Any =
    Minhash.sig(a.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.Minhash.sig($a, $numHashes)")

  override protected def withNewChildInternal(c: Expression): MinhashSigExpr =
    copy(child = c)
}
