package graft

import graft.ops.TeraSort
import org.apache.spark.sql.functions._

/** Terasort analog: the certificate must be earned, not asserted — the
  * validator has to PASS on a real sort and FAIL on adversarial inputs
  * (an unsorted frame, a dropped row), and the plan must be the one the
  * benchmark exists to measure: a single RangePartitioning exchange.
  */
class TeraSortSpec extends SparkSpec {

  test("generate → sort → validate: certificate green, 100-byte records") {
    val out = TeraSort.run(spark, 50000L).collect().head
    assert(out.getLong(0) == 50000L)
    assert(out.getBoolean(1), "order + permutation certificate failed")
    // the halves reassemble to a positive value with lo in [0, 2^63)
    assert(out.getLong(2) > 0L && out.getLong(3) >= 0L)
    // record layout: 10-byte key + 90-byte payload
    val r = TeraSort.generate(spark, 10L).collect().head
    assert(r.getAs[Array[Byte]](0).length == 10)
    assert(r.getAs[Array[Byte]](1).length == 90)
  }

  test("permutation checksum is oracle-reproducible (golden n=1000)") {
    // DuckDB twin (FULL 10-byte key = prefix·2^16 + tail):
    //   SELECT CAST(SUM(CAST('0x'||substr(h,1,16) AS UBIGINT)::HUGEINT
    //     * 65536 + CAST('0x'||substr(h,17,4) AS UBIGINT)::HUGEINT)
    //     AS DECIMAL(38,0))
    //   FROM (SELECT md5(CAST(i AS VARCHAR)) h FROM range(1000) t(i))
    val golden = new java.math.BigDecimal("601283168030483177126788388")
    val (goldenHi, goldenLo) = TeraSort.splitChecksum(golden)
    // the split round-trips: hi·2^63 + lo == golden
    assert(java.math.BigInteger.valueOf(goldenHi).shiftLeft(63)
      .add(java.math.BigInteger.valueOf(goldenLo))
      .equals(golden.toBigIntegerExact))
    val out = TeraSort.run(spark, 1000L).collect().head
    assert(out.getLong(2) == goldenHi && out.getLong(3) == goldenLo,
      s"checksum halves (${out.getLong(2)},${out.getLong(3)}) != " +
        s"oracle golden ($goldenHi,$goldenLo)")
    // and all three formulations agree: the streaming JVM pass, the
    // hex→conv→decimal expression (the oracle's shape), and the golden
    val gen = TeraSort.generate(spark, 1000L)
    assert(TeraSort.checksum(gen, col("key")).compareTo(golden) == 0)
    val exprSum = gen
      .agg(sum(TeraSort.keyChecksum(col("key")))).collect().head.getDecimal(0)
    assert(exprSum.compareTo(golden) == 0)
  }

  test("splitChecksum round-trips across the representable range " +
      "(property: hi*2^63 + lo == value, 0 <= lo < 2^63)") {
    val rnd = new scala.util.Random(7)
    val two63 = java.math.BigInteger.ONE.shiftLeft(63)
    // random sums up to the 1.3e36 documented bound, plus the edges
    val cases = Seq(java.math.BigInteger.ZERO, java.math.BigInteger.ONE,
      two63.subtract(java.math.BigInteger.ONE), two63,
      new java.math.BigInteger("1299999999999999999999999999999999999")) ++
      (1 to 200).map(_ => new java.math.BigInteger(120, rnd.self))
    cases.foreach { v =>
      val (hi, lo) = TeraSort.splitChecksum(new java.math.BigDecimal(v))
      assert(lo >= 0L && hi >= 0L)
      assert(java.math.BigInteger.valueOf(hi).shiftLeft(63)
        .add(java.math.BigInteger.valueOf(lo)).equals(v),
        s"round-trip failed for $v: ($hi, $lo)")
    }
  }

  test("validator rejects an unsorted frame") {
    val unsorted = TeraSort.generate(spark, 10000L, numPartitions = 4)
    // range-partition WITHOUT sorting within partitions: boundaries hold
    // but partitions are internally unordered
    val (ok, rows, _) = TeraSort.validate(
      unsorted.repartitionByRange(4, col("key")), "key")
    assert(!ok, "validator passed an unsorted frame")
    assert(rows == 10000L)
  }

  test("checksum catches a dropped row") {
    val in = TeraSort.generate(spark, 5000L)
    val full = TeraSort.checksum(in, col("key"))
    val dropped = TeraSort.checksum(in.limit(4999), col("key"))
    assert(full.compareTo(dropped) != 0)
  }

  test("plan: exactly one RangePartitioning exchange, no hash exchange") {
    val plan = TeraSort.sortRecords(TeraSort.generate(spark, 10000L),
      col("key")).queryExecution.executedPlan.toString
    assert("Exchange rangepartitioning".r.findAllIn(plan).size == 1,
      s"expected one range exchange:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected hash exchange:\n$plan")
  }

  test("sort order matches the oracle's lexicographic contract on hex keys") {
    // q223's sampled-position gate pins this against DuckDB; here pin the
    // binary-key variant: unsigned byte order == hex-string order of the
    // same md5 (hex is order-isomorphic to its bytes)
    val hex = spark.range(1000)
      .select(md5(col("id").cast("string")).as("h"))
      .orderBy(col("h")).collect().map(_.getString(0))
    val bin = TeraSort.sortRecords(TeraSort.generate(spark, 1000L),
        col("key")).collect()
      .map(r => r.getAs[Array[Byte]](0).map("%02x".format(_)).mkString)
    assert(bin.toSeq == hex.map(_.take(20)).sorted.toSeq)
  }
}
