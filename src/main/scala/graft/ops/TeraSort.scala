package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Terasort analog — the reference's signature benchmark
  * (`testing/benchmarks/ecl/terasort.ecl:20-34`: global UNSTABLE SORT of
  * n 100-byte records, generated in place, then validated). The Spark-first
  * lowering IS `orderBy`: Catalyst plans exactly one RangePartitioning
  * exchange (sampled split points — the same strategy the reference's
  * thorlcr/msort/tsortm.cpp implements by hand) followed by a per-partition
  * sort. Nothing here fights the engine; the operator exists so the
  * benchmark and its validation discipline (order certificate + permutation
  * checksum, "teravalidate") are first-class and plan-audited.
  *
  * Record layout: 10-byte binary key (deterministic md5-derived — no RNG
  * state to ship, and an oracle can reproduce it) + 90-byte filler.
  * BinaryType ordering in Spark is unsigned lexicographic, matching the
  * benchmark's byte-key contract.
  *
  * Scale: generation is embarrassingly parallel over `spark.range`; the
  * sort is one range exchange (n log n, linear per 10× in the exchange
  * and merge); validation is one summary pass collecting O(#partitions)
  * rows to the driver — no full-data materialization anywhere.
  */
object TeraSort {

  /** n deterministic 100-byte records: key = first 10 bytes of
    * md5(id), payload = 90 constant bytes (the sort pays to move them
    * either way). Embarrassingly parallel, no shuffle.
    */
  def generate(spark: SparkSession, n: Long,
      numPartitions: Int = 0): DataFrame = {
    val base = if (numPartitions > 0) spark.range(0, n, 1, numPartitions)
      else spark.range(n)
    base.select(
      unhex(substring(md5(col("id").cast("string")), 1, 20)).as("key"),
      expr("repeat(x'58', 90)").cast("binary").as("payload"))
  }

  /** Global unstable sort by `key` — lowers to ONE RangePartitioning
    * exchange + per-partition sort (PlanAuditSpec pins this).
    */
  def sortRecords(df: DataFrame, key: Column): DataFrame = df.orderBy(key)

  /** Per-partition validation summary: is the partition internally
    * sorted, its first/last key, row count, and a permutation checksum
    * (decimal sum of xxhash64(key) — order-independent, overflow-safe).
    */
  private final case class PartSummary(pid: Int, okWithin: Boolean,
      first: Array[Byte], last: Array[Byte], rows: Long,
      checksum: java.math.BigDecimal)

  private def unsignedCompare(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val len = math.min(a.length, b.length)
    while (i < len) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** One streaming pass over each partition of `sorted` (keyed by column
    * `key`): O(#partitions) rows to the driver, never the data.
    */
  private def summarize(sorted: DataFrame, key: String): Seq[PartSummary] = {
    val ki = sorted.schema.fieldIndex(key)
    sorted.select(col(key), xxhash64(col(key)).as("__h"))
      .rdd.mapPartitionsWithIndex { (pid, it) =>
        var ok = true
        var first: Array[Byte] = null
        var last: Array[Byte] = null
        var rows = 0L
        var sum = java.math.BigDecimal.ZERO
        it.foreach { r =>
          val k = r.getAs[Array[Byte]](0)
          if (first == null) first = k
          if (last != null && unsignedCompare(last, k) > 0) ok = false
          last = k
          rows += 1
          sum = sum.add(java.math.BigDecimal.valueOf(r.getLong(1)))
        }
        Iterator(PartSummary(pid, ok, first, last, rows, sum))
      }.collect().toSeq.sortBy(_.pid)
  }

  /** Order-independent permutation checksum of `key` over `df`. */
  def checksum(df: DataFrame, key: Column): java.math.BigDecimal =
    df.agg(sum(xxhash64(key).cast(DecimalType(38, 0))).as("c"))
      .collect().head.getDecimal(0)

  /** Full validation certificate over a sorted frame: every partition
    * internally sorted, partition boundaries globally ordered (range
    * partitioning's contract), row count, and the permutation checksum.
    */
  def validate(sorted: DataFrame, key: String): (Boolean, Long, java.math.BigDecimal) = {
    val parts = summarize(sorted, key).filter(_.rows > 0)
    val within = parts.forall(_.okWithin)
    val across = parts.sliding(2).forall {
      case Seq(a, b) => unsignedCompare(a.last, b.first) <= 0
      case _ => true
    }
    (within && across, parts.map(_.rows).sum,
      parts.map(_.checksum).foldLeft(java.math.BigDecimal.ZERO)(_.add(_)))
  }

  /** generate → sort → validate, returning a ONE-ROW certificate:
    * (n_rows, sorted_ok, checksum_ok). The bench entry times this whole
    * pipeline — the reference's terasort + teravalidate in one.
    */
  def run(spark: SparkSession, n: Long, numPartitions: Int = 0): DataFrame = {
    val in = generate(spark, n, numPartitions)
    val inSum = checksum(in, col("key"))
    val sorted = sortRecords(in, col("key"))
    val (ok, rows, outSum) = validate(sorted, "key")
    val schema = StructType(Seq(
      StructField("n_rows", LongType, nullable = false),
      StructField("sorted_ok", BooleanType, nullable = false),
      StructField("checksum_ok", BooleanType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(Row(rows, ok, inSum.compareTo(outSum) == 0)),
      schema)
  }
}
