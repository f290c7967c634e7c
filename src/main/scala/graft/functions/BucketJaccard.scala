package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Bucket-local jaccard pair generator — the IO-shape fix for LSH refine
  * at scale.
  *
  * The join-based refine (`lshCandidates` → `jaccardSets`) shuffles ONE
  * ROW PER CANDIDATE PAIR carrying a full shingle-set payload: at the
  * sf10 rehearsal that is 33.6 M rows × ~2 KB arrays through the doc_b
  * exchange (~10² GB — measured as the dominant cost of the whole
  * near-dup family, 554–660 s cold). But every candidate pair coexists
  * in some LSH bucket, so the pairwise work can run BUCKET-LOCALLY: ship
  * each doc's set once per band (4 × |sets| ≈ 8 GB at sf10), group by
  * (band, bk), and emit only the slim (doc_a, doc_b, inter, jac) rows.
  * This generator is that per-bucket step: given the bucket's members
  * as array<struct<doc_id, ss>> (ss sorted + distinct — the
  * [[IntersectCount]] layout), it enumerates ordered pairs, merge-counts
  * the intersection, and emits pairs with jac >= minJac.
  *
  * Values are IDENTICAL to the join lowering: same sorted-merge
  * intersection ([[IntersectCount.sortedCount]]), same
  * `inter / (|a| + |b| - inter)` double division of exact longs, pairs
  * oriented doc_a < doc_b (members are sorted by doc_id internally, so
  * bucket order does not matter), and a pair appearing in several bands
  * emits byte-identical rows that a downstream
  * `dropDuplicates(doc_a, doc_b)` collapses — the same distinct the
  * join lowering applied to its candidate pairs.
  *
  * Skew note: a bucket of s members does s²/2 merge walks in one task —
  * the SAME s² the bucket self-join produced as join output rows, minus
  * the payload materialization. Pairs are emitted LAZILY (the generator
  * returns an iterator, never an O(s²) buffer), so per-task memory is
  * O(s) member arrays; `TextOps.lshJaccardPairs` additionally routes
  * buckets above its `maxBucket` threshold through the distributed join
  * lowering, so a pathological hot bucket (all-identical docs at corpus
  * scale) never concentrates its s² work or its s payloads in one task.
  */
case class BucketJaccardPairs(child: Expression, minJac: Double,
    failOnError: Boolean =
      org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("inter", LongType, nullable = false),
    StructField("jac", DoubleType, nullable = false)))

  override def prettyName: String = "bucket_jaccard_pairs"

  private val memberType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ss", ArrayType(StringType))))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 2 && s(0).dataType == LongType &&
          s(1).dataType.isInstanceOf[ArrayType] &&
          s(1).dataType.asInstanceOf[ArrayType].elementType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bucket_jaccard_pairs expects array<struct<doc_id: bigint, " +
        s"ss: array<string>>>, got ${other.sql}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Iterator.empty
    val members = arr.asInstanceOf[ArrayData]
    val n = members.numElements()
    if (n < 2) return Iterator.empty
    val ids = new Array[Long](n)
    val sets = new Array[ArrayData](n)
    var k = 0
    var m = 0
    while (k < n) {
      if (!members.isNullAt(k)) {
        val row = members.getStruct(k, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          ids(m) = row.getLong(0)
          sets(m) = row.getArray(1)
          m += 1
        }
      }
      k += 1
    }
    // sort members by doc_id so pairs come out doc_a < doc_b regardless
    // of collect_list order (which is partition-nondeterministic)
    val order = Array.range(0, m).sortBy(ids(_))
    // lazy pair stream: GenerateExec drains each row's iterator before
    // advancing the input row, so holding the member ArrayData refs is
    // safe, and the task never buffers the O(m²) pair set
    val mm = m
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      private var nextRow: InternalRow = _
      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null && i < mm - 1) {
          val a = order(i)
          val b = order(j)
          val inter = IntersectCount.sortedCount(sets(a), sets(b))
          val union = sets(a).numElements().toLong +
            sets(b).numElements().toLong - inter
          // two empty sets: mirror the join lowering in BOTH SQL modes so
          // the emitted set never depends on maxBucket routing. ANSI (the
          // engine default, captured at construction like Spark's own
          // failOnError arithmetic): jaccardSets' 0/0 throws
          // DIVIDE_BY_ZERO — fail loudly here too. Non-ANSI: the join
          // lowering's 0/0 fails its `jac >= minJac` filter (verified by
          // TextOpsSpec), so the pair is silently dropped — Java's
          // NaN >= x is false, giving the same skip for free.
          if (union == 0L && failOnError) throw new ArithmeticException(
            s"bucket_jaccard_pairs: jaccard undefined for two empty sets " +
              s"(doc_a=${ids(a)}, doc_b=${ids(b)}); filter empty shingle " +
              "sets upstream (shingleSet does)")
          val jac = inter.toDouble / union.toDouble
          if (jac >= minJac) {
            val r = new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(4)
            r.setLong(0, ids(a))
            r.setLong(1, ids(b))
            r.setLong(2, inter)
            r.update(3, jac)
            nextRow = r
          }
          j += 1
          if (j >= mm) { i += 1; j = i + 1 }
        }
      }
      advance()
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = {
        val r = nextRow; advance(); r
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): BucketJaccardPairs =
    copy(child = c)
}
