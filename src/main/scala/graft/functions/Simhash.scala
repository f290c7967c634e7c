package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** SimHash fingerprint kernel: per document,
  * `fp = Σ_j [ Σ_tokens (bit j of h(token) ? +1 : −1) > 0 ] · 2^j` with
  * `h(token)` = the first nBits/4 hex digits of md5(token) as an integer —
  * exactly the values of the explode → 60-column conditional-sum →
  * sign-assembly formulation the DuckDB oracles reproduce
  * (`TextOps.simhashWide`'s former shape).
  *
  * That shape shipped one row PER TOKEN into a groupBy carrying nBits
  * sum buffers — at the sf10 rehearsal ~10⁸ token rows through a
  * 60-column aggregate, the dominant cost of the simhash family. The
  * kernel folds a document's whole token array in one JVM loop (reused
  * MessageDigest, int bit counters), so the fingerprint is computed
  * inside the scan projection and nothing explodes.
  *
  * Duplicate tokens count once per occurrence (the explode semantics —
  * the input is the raw token array, NOT a distinct set). A null token
  * element contributes −1 to every bit, matching the former
  * `when(bit, 1).otherwise(-1)` on a null hash. Callers drop docs with
  * empty token arrays, matching explode-of-empty emitting no group.
  */
object Simhash {

  /** One document's fingerprint from its token array. */
  def fp(tokens: ArrayData, nBits: Int): Long = {
    val md = MessageDigest.getInstance("MD5")
    val counters = new Array[Int](nBits)
    val hexChars = nBits / 4
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) {
        var j = 0
        while (j < nBits) { counters(j) -= 1; j += 1 }
      } else {
        md.reset()
        val d = md.digest(tokens.getUTF8String(i).getBytes)
        // first hexChars nibbles of the digest, big-endian — identical to
        // conv(substring(md5(w), 1, hexChars), 16, 10)
        var h = 0L
        var k = 0
        while (k < hexChars) {
          val nib = if ((k & 1) == 0) (d(k >> 1) >> 4) & 0xf
                    else d(k >> 1) & 0xf
          h = (h << 4) | nib
          k += 1
        }
        var j = 0
        while (j < nBits) {
          if (((h >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < nBits) {
      if (counters(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** `simhash_fp(tokens)` with a plan-time bit width — see [[Simhash]]. */
case class SimhashExpr(child: Expression, nBits: Int)
    extends UnaryExpression {
  require(nBits % 4 == 0 && nBits >= 4 && nBits <= 60,
    s"nBits must be a multiple of 4 in [4, 60], got $nBits")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_fp"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_fp expects array<string>, got ${other.sql}")
  }

  override protected def nullSafeEval(a: Any): Any =
    Simhash.fp(a.asInstanceOf[ArrayData], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.Simhash.fp($a, $nBits)")

  override protected def withNewChildInternal(c: Expression): SimhashExpr =
    copy(child = c)
}
