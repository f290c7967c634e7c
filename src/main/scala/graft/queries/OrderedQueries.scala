package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.DedupRollup
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.queries.CoreQueries.{sumD, sumDSql}

/** Ordered-stateful scan ops (SURVEY §2.7): the DEDUP family, ROLLUP
  * (run-id sessionization), ITERATE/PROCESS (sorted fold / running window),
  * RANK, and order-sensitive grouped aggregation.
  */
object OrderedQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- DEDUP adjacent on sorted input (TAKdedup :890) ------------------
    QueryDef("q40_dedup_adjacent",
      """SELECT l_orderkey, l_linenumber FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber) AS rn
        |  FROM lineitem) WHERE rn = 1
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      DedupRollup.dedupAdjacent(
        Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_linenumber")),
        Seq(col("l_orderkey")),
        Seq(col("l_orderkey"), col("l_linenumber")))
        .orderBy(col("l_orderkey"))
    },

    // ---- DEDUP ALL / hash dedup (TAKhashdedup :906) ----------------------
    QueryDef("q41_dedup_all",
      """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin) { (s, dir) =>
      DedupRollup.dedupAll(
        Tables.customer(s, dir).select(col("c_nationkey"), col("c_mktsegment")),
        Seq("c_nationkey", "c_mktsegment"))
        .orderBy(col("c_nationkey"), col("c_mktsegment"))
    },

    // ---- DEDUP KEEP n ----------------------------------------------------
    QueryDef("q42_dedup_keepn",
      """SELECT c_nationkey, c_custkey FROM (
        |  SELECT c_nationkey, c_custkey,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
        |  FROM customer) WHERE rn <= 3
        |ORDER BY c_nationkey, c_custkey""".stripMargin) { (s, dir) =>
      DedupRollup.dedupKeepN(
        Tables.customer(s, dir).select(col("c_nationkey"), col("c_custkey")),
        Seq(col("c_nationkey")), Seq(col("c_custkey")), 3)
        .orderBy(col("c_nationkey"), col("c_custkey"))
    },

    // ---- DEDUP BEST (HDFkeepbest :1532) ----------------------------------
    QueryDef("q43_dedup_best",
      """SELECT c_nationkey, c_custkey, CAST(c_acctbal AS DOUBLE) AS best_bal
        |FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) WHERE rn = 1
        |ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      DedupRollup.dedupBest(
        Tables.customer(s, dir)
          .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal")),
        Seq(col("c_nationkey")),
        Seq(col("c_acctbal").desc, col("c_custkey")))
        .select(col("c_nationkey"), col("c_custkey"),
          col("c_acctbal").cast("double").as("best_bal"))
        .orderBy(col("c_nationkey"))
    },

    // ---- ROLLUP: collapse runs of adjacent matching rows (TAKrollup :894)
    // gaps-and-islands over (user_id, event_type) in (user_id, ts) order ----
    QueryDef("q44_rollup",
      s"""WITH d AS (
         |  SELECT user_id, event_type, ts, event_id, value,
         |    CASE WHEN LAG(user_id) OVER w IS DISTINCT FROM user_id
         |           OR LAG(event_type) OVER w IS DISTINCT FROM event_type
         |         THEN 1 ELSE 0 END AS chg
         |  FROM events WINDOW w AS (ORDER BY user_id, ts, event_id)),
         |r AS (
         |  SELECT *, SUM(chg) OVER (ORDER BY user_id, ts, event_id
         |    ROWS UNBOUNDED PRECEDING) AS run FROM d)
         |SELECT user_id, event_type, COUNT(*) AS n, MIN(ts) AS start_ts,
         |  ${sumDSql("value", "sum_value")}
         |FROM r GROUP BY run, user_id, event_type
         |ORDER BY user_id, start_ts""".stripMargin) { (s, dir) =>
      DedupRollup.rollupRuns(
        Tables.events(s, dir),
        Seq(col("user_id"), col("event_type")),
        Seq(col("user_id"), col("ts"), col("event_id")),
        Seq(count(lit(1)).as("n"), min(col("ts")).as("start_ts"),
          sumD(col("value"), "sum_value")))
        .select(col("user_id"), col("event_type"), col("n"), col("start_ts"),
          col("sum_value"))
        .orderBy(col("user_id"), col("start_ts"))
    },

    // ---- ITERATE: general sorted fold via flatMapGroups (TAKiterate :895)
    // running exact decimal cumsum per user — sequential within group,
    // parallel across groups (the reference's execution shape) -------------
    QueryDef("q45_iterate",
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(25,6)))
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      // exact decimal(.,6) accumulation carried as long micro-units — the
      // fold stays primitive (no per-row BigDecimal) yet matches the
      // oracle's DECIMAL(25,6) window sum bit-for-bit
      val in = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"),
          (col("value").cast(DecimalType(25, 6)) * 1000000).cast("long")
            .as("micros"))
      val outSchema = StructType(Seq(
        StructField("user_id", LongType),
        StructField("event_id", LongType),
        StructField("cum_micros", LongType)))
      DedupRollup.iterateGroups(in, Seq("user_id"),
          Seq(col("ts"), col("event_id")), outSchema) { (prev, r) =>
        val prior = prev.map(_.getLong(2)).getOrElse(0L)
        Row(r.getLong(0), r.getLong(1), prior + r.getLong(3))
      }
        .select(col("user_id"), col("event_id"),
          (col("cum_micros").cast("double") / 1e6).as("running_value"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // ---- PROCESS: running state as codegen'd window agg (TAKprocess :994)
    QueryDef("q46_process",
      """SELECT user_id, event_id,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS err_cnt
        |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      DedupRollup.runningAgg(
        Tables.events(s, dir),
        Seq(col("user_id")), Seq(col("ts"), col("event_id")),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)), "err_cnt")
        .select(col("user_id"), col("event_id"), col("err_cnt"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // ---- RANK/RANKED (no_rank :409) --------------------------------------
    QueryDef("q47_rank",
      """SELECT c_nationkey, c_custkey,
        |  RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk
        |FROM customer
        |QUALIFY rnk <= 5
        |ORDER BY c_nationkey, rnk, c_custkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc)
      Tables.customer(s, dir)
        .withColumn("rnk", rank().over(w))
        .filter(col("rnk") <= 5)
        .select(col("c_nationkey"), col("c_custkey"),
          col("rnk").cast("long").as("rnk"))
        .orderBy(col("c_nationkey"), col("rnk"), col("c_custkey"))
    },

    // ---- grouped order-sensitive aggregate (GROUP + sorted rowset) -------
    QueryDef("q48_grouped_ordered_agg",
      """SELECT c_nationkey,
        |  STRING_AGG(c_name, ',' ORDER BY c_custkey) AS names
        |FROM customer WHERE c_custkey <= 100
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).filter(col("c_custkey") <= 100)
        .groupBy(col("c_nationkey"))
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("c_custkey"), col("c_name")))),
            x => x.getField("c_name")), ",").as("names"))
        .orderBy(col("c_nationkey"))
    },

    // ---- ungrouped ITERATE: GLOBAL running sum via the two-pass scan -----
    // (Positions.runningSumSorted — no single-partition window; exact
    // decimal accumulation, one final cast to double on both sides)
    QueryDef("q49_global_running_sum",
      """SELECT o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
        |    OVER (ORDER BY o_orderkey ROWS UNBOUNDED PRECEDING)
        |    AS DOUBLE) AS running_total
        |FROM orders WHERE o_orderkey <= 20000
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val in = Tables.orders(s, dir).filter(col("o_orderkey") <= 20000)
        .select(col("o_orderkey"), col("o_totalprice"))
      graft.model.GraftFrame(in)
        .runningSum(col("o_totalprice").cast(DecimalType(25, 6)),
          Seq(col("o_orderkey")), "rs")
        .df
        .select(col("o_orderkey"), col("rs").cast("double").as("running_total"))
        .orderBy(col("o_orderkey"))
    },

    // ---- terasort analog (testing/benchmarks/ecl/terasort.ecl:20-34):
    // global sort of deterministic md5-derived keys. The oracle gate pins
    // the full global ORDER via sampled positions (every 97th row of the
    // sort order, computed by the two-pass Positions scan — no
    // single-partition window); the sf-scaled 100-byte-record run with
    // order + checksum certificate is q224 below -------------------------
    QueryDef("q223_terasort",
      """WITH r AS (SELECT md5(CAST(i AS VARCHAR)) AS k
        |  FROM range(100000) t(i)),
        |s AS (SELECT k, ROW_NUMBER() OVER (ORDER BY k) AS pos FROM r)
        |SELECT pos, k FROM s WHERE pos % 97 = 1 ORDER BY pos""".stripMargin) {
      (s, dir) =>
      val keys = s.range(100000)
        .select(md5(col("id").cast("string")).as("k"))
      graft.ops.Positions.withGlobalPosition(keys, Seq(col("k")), "pos")
        .filter(col("pos") % 97 === 1)
        .select(col("pos"), col("k"))
        .orderBy(col("pos"))
    },

    // sf-scaled terasort + teravalidate: n = 4 × |lineitem| 100-byte
    // records, one RangePartitioning exchange, certificate row out.
    // The certificate is oracle-checkable: the permutation checksum is
    // the sum of each FULL 10-byte key as an unsigned 80-bit integer,
    // which DuckDB reproduces from the generation contract (md5 hex)
    // without ever seeing the sorted data — the hash-match certifies
    // the sort preserved the multiset of keys. The ~2^90-bounded sum is
    // carried as TWO BIGINT halves (value = hi·2^63 + lo): 64-bit
    // integers have one canonical representation under every hasher,
    // where a DECIMAL(38,0) column proved to be a canonicalization seam
    // between independent hashers of otherwise-equal outputs.
    // (range() only takes constants in DuckDB, so the oracle synthesizes
    // ids 0..4n-1 as 4*rownum+j over lineitem × range(4).)
    QueryDef("q224_terasort_scale",
      """WITH nn AS (SELECT CAST(4*count(*) AS BIGINT) AS n FROM lineitem),
        |idx AS (SELECT (ROW_NUMBER() OVER ()) - 1 AS rn FROM lineitem),
        |r AS (SELECT md5(CAST(rn*4 + j AS VARCHAR)) AS h
        |      FROM idx, range(4) t(j)),
        |s AS (SELECT SUM(CAST('0x' || substr(h,1,16) AS UBIGINT)::HUGEINT
        |        * 65536
        |      + CAST('0x' || substr(h,17,4) AS UBIGINT)::HUGEINT) AS total
        |  FROM r)
        |SELECT (SELECT n FROM nn) AS n_rows,
        |  TRUE AS sorted_ok,
        |  CAST(total // 9223372036854775808 AS BIGINT) AS checksum_hi,
        |  CAST(total % 9223372036854775808 AS BIGINT) AS checksum_lo
        |FROM s""".stripMargin) { (s, dir) =>
      val n = 4L * Tables.lineitem(s, dir).count()
      graft.ops.TeraSort.run(s, n)
    }
  )
}
