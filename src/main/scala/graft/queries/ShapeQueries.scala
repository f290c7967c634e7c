package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Distribute, Shape}
import org.apache.spark.sql.functions._
import graft.queries.CoreQueries.{sumD, sumDSql}

/** Reshaping / multi-input / distribution ops (SURVEY §2.8-2.10) plus the
  * streaming-window analogs run in batch mode (§2.12).
  */
object ShapeQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- NORMALIZE fan-out with COUNTER (TAKnormalize :907) --------------
    QueryDef("q60_normalize",
      """SELECT r_regionkey, g.counter FROM region,
        |  (SELECT UNNEST(generate_series(1, 3)) AS counter) g
        |ORDER BY r_regionkey, counter""".stripMargin) { (s, dir) =>
      Shape.normalize(Tables.region(s, dir).select(col("r_regionkey")),
          lit(3), "counter")
        .select(col("r_regionkey"), col("counter").cast("long").as("counter"))
        .orderBy(col("r_regionkey"), col("counter"))
    },

    // ---- NORMALIZE child explode (TAKnormalizechild :910) ----------------
    QueryDef("q61_normalize_child",
      """SELECT o_orderkey, UNNEST([o_orderstatus, o_orderpriority]) AS tag
        |FROM orders WHERE o_orderkey <= 2000
        |ORDER BY o_orderkey, tag""".stripMargin) { (s, dir) =>
      Shape.normalizeChild(
        Tables.orders(s, dir).filter(col("o_orderkey") <= 2000)
          .select(col("o_orderkey"),
            array(col("o_orderstatus"), col("o_orderpriority")).as("child")),
        "child", "tag")
        .orderBy(col("o_orderkey"), col("tag"))
    },

    // ---- child-dataset AGGREGATE without explode (§2.10 superset): ECL
    // computes over a child DATASET inline (COUNT(child)/SUM(child.x) per
    // parent row, eclhelper child iterators); the Spark lowering keeps the
    // child NESTED and folds it with higher-order functions — aggregate()/
    // filter()/size() run inside whole-stage codegen, zero extra shuffle
    // beyond building the nested rows, no explode → re-group round trip.
    // Oracle: the flat GROUP BY equivalent.
    QueryDef("q221_child_aggregate",
      """SELECT l_orderkey AS o_orderkey,
        |  CAST(COUNT(*) AS INTEGER) AS n_lines,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |  CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') AS INTEGER)
        |    AS n_returned
        |FROM lineitem WHERE l_orderkey <= 2000
        |GROUP BY l_orderkey ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
      val nested = Tables.lineitem(s, dir)
        .filter(col("l_orderkey") <= 2000)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(collect_list(struct(col("l_quantity"), col("l_returnflag")))
          .as("lines"))
      nested.select(col("o_orderkey"),
          size(col("lines")).as("n_lines"),
          expr("CAST(aggregate(lines, CAST(0 AS DECIMAL(25,6)), " +
            "(acc, x) -> CAST(acc + CAST(x.l_quantity AS DECIMAL(25,6)) " +
            "AS DECIMAL(25,6))) AS DOUBLE)")
            .as("sum_qty"),
          size(expr("filter(lines, x -> x.l_returnflag = 'R')"))
            .as("n_returned"))
        .orderBy(col("o_orderkey"))
    },

    // ---- FUNNEL + MERGE(SORTED, DEDUP) (TAKfunnel :903 / TAKmerge :937).
    // DEDUP collapses rows equal under the MERGE KEY (not whole rows): the
    // two inputs carry DIFFERENT payloads for overlapping keys, and the
    // first input's row must survive (input-rank tiebreak) — the honest
    // reference semantics (CStreamMerger dedups via the sort-key compare) --
    QueryDef("q62_funnel_merge",
      """WITH u AS (
        |  SELECT o_orderkey, o_orderpriority, 1 AS src
        |  FROM orders WHERE o_totalprice > 250000
        |  UNION ALL
        |  SELECT o_orderkey, 'B-SIDE' AS o_orderpriority, 2 AS src
        |  FROM orders WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000)
        |SELECT o_orderkey, o_orderpriority FROM (
        |  SELECT o_orderkey, o_orderpriority,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY src) AS rn
        |  FROM u) WHERE rn = 1
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
      Shape.merge(
        Seq(
          o.filter(col("o_totalprice") > 250000)
            .select(col("o_orderkey"), col("o_orderpriority"), lit(1).as("src")),
          o.filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 200000)
            .select(col("o_orderkey"), lit("B-SIDE").as("o_orderpriority"),
              lit(2).as("src"))),
        Seq(col("o_orderkey")), dedup = true,
        dedupKeys = Seq("o_orderkey"), tiebreak = Seq(col("src")))
        .drop("src")
    },

    // ---- NONEMPTY (TAKnonempty :1008) ------------------------------------
    QueryDef("q63_nonempty",
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey") { (s, dir) =>
      Shape.nonempty(Seq(
        Tables.region(s, dir).filter(col("r_regionkey") < 0)
          .select(col("r_regionkey"), col("r_name")),
        Tables.region(s, dir).select(col("r_regionkey"), col("r_name"))))
        .orderBy(col("r_regionkey"))
    },

    // ---- COMBINE: positional zip (TAKcombine :981) -----------------------
    QueryDef("q64_combine",
      """WITH a AS (SELECT n_nationkey, n_name,
        |    ROW_NUMBER() OVER (ORDER BY n_nationkey) AS __pos FROM nation),
        |b AS (SELECT n_nationkey AS by_region_key,
        |    ROW_NUMBER() OVER (ORDER BY n_regionkey, n_nationkey) AS __pos FROM nation)
        |SELECT a.n_nationkey, a.n_name, b.by_region_key
        |FROM a JOIN b ON a.__pos = b.__pos
        |ORDER BY a.n_nationkey""".stripMargin) { (s, dir) =>
      val n = Tables.nation(s, dir)
      Shape.combine(
        n.select(col("n_nationkey"), col("n_name")),
        Seq(col("n_nationkey")),
        n.select(col("n_nationkey").as("by_region_key"), col("n_regionkey")),
        Seq(col("n_regionkey"), col("by_region_key")))
        .select(col("n_nationkey"), col("n_name"), col("by_region_key"))
        .orderBy(col("n_nationkey"))
    },

    // ---- PROJECT with COUNTER (TAKcountproject :917) ---------------------
    QueryDef("q65_count_project",
      """SELECT s_suppkey, s_name,
        |  ROW_NUMBER() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS counter
        |FROM supplier ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      Shape.countProject(
        Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"), col("s_acctbal")),
        Seq(col("s_acctbal").desc, col("s_suppkey")), "counter")
        .select(col("s_suppkey"), col("s_name"), col("counter").cast("long").as("counter"))
        .orderBy(col("s_suppkey"))
    },

    // ---- DISTRIBUTE + LOCAL op (TAKhashdistribute :905): co-locate by key
    // then per-partition dedup == global dedup (proves the partitioning
    // contract the reference compiles into LOCAL activities) ---------------
    QueryDef("q66_distribute_local",
      """SELECT DISTINCT o_custkey, o_orderstatus FROM orders
        |ORDER BY o_custkey, o_orderstatus""".stripMargin) { (s, dir) =>
      val d = Distribute.byHash(
        Tables.orders(s, dir).select(col("o_custkey"), col("o_orderstatus")),
        Seq(col("o_custkey")))
      // LOCAL dedup: correct only because rows are co-located by key
      d.mapPartitions(it => {
        val seen = scala.collection.mutable.HashSet.empty[(Any, Any)]
        it.filter(r => seen.add((r.get(0), r.get(1))))
      })(org.apache.spark.sql.Encoders.row(d.schema))
        .orderBy(col("o_custkey"), col("o_orderstatus"))
    },

    // ---- tumbling window over events (§2.12; batch mode of the
    // Structured Streaming lowering) ---------------------------------------
    QueryDef("q67_tumbling_window",
      s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket,
         |  COUNT(*) AS n, ${sumDSql("value", "sum_value")}
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"), sumD(col("value"), "sum_value"))
        .select(col("w.start").as("bucket"), col("n"), col("sum_value"))
        .orderBy(col("bucket"))
    },

    // ---- sliding (hopping) window, 2h width / 1h slide (§2.12): each
    // event lands in exactly two buckets — the oracle states that as a
    // union of the two shifted tumbling assignments.
    QueryDef("q69_sliding_window",
      """WITH hits AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour'
        |  FROM events)
        |SELECT bucket, COUNT(*) AS n
        |FROM hits GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      graft.streaming.Streams.slidingCounts(
          Tables.events(s, dir), "ts", "2 hours", "1 hour")
        .orderBy(col("bucket"))
    },

    // ---- session window per user, 5-minute gap (§2.12) -------------------
    QueryDef("q68_session_window",
      """WITH d AS (
        |  SELECT user_id, ts,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |           OR ts - LAG(ts) OVER w >= INTERVAL '5 minutes'
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |r AS (
        |  SELECT user_id, ts, SUM(chg) OVER (PARTITION BY user_id
        |    ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess FROM d)
        |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n
        |FROM r GROUP BY user_id, sess
        |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "5 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("w.start").as("session_start"), col("n"))
        .orderBy(col("user_id"), col("session_start"))
    },

    // ---- REGROUP (TAKregroup :982): append grouped datasets with the SAME
    // group keys, preserving grouping — observable because a grouped
    // aggregate over the regrouped frame folds rows from BOTH inputs into
    // one group per key. Oracle: GROUP BY over the union of the two inputs.
    QueryDef("q229_regroup",
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders WHERE o_orderstatus IN ('F', 'O')
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import graft.model.GraftFrame
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
      val a = GraftFrame(o.filter(col("o_orderstatus") === "F"))
        .group("o_orderpriority")
      val b = GraftFrame(o.filter(col("o_orderstatus") === "O"))
        .group("o_orderpriority")
      a.regroup(b)
        .aggregate(count(lit(1)).as("cnt"), sum(col("o_orderkey")).as("key_sum"))
        .df.orderBy(col("o_orderpriority"))
    },

    // ---- LIMIT guard (eclhelper.hpp:1448): FAIL (error past n) and SKIP
    // (empty past n) variants, all four observable paths in one result:
    // guard-pass (nation ≤ 100), skip-pass (region ≤ 100), skip-exceeded
    // (customer > 10 → zero rows), guard-exceeded (customer > 10 → the
    // IllegalStateException is caught and surfaced as a marker row — if the
    // guard ever stops throwing, the marker disappears and the oracle row
    // count mismatches).
    QueryDef("q230_limit_guard",
      """SELECT 'guard_pass' AS src, CAST(n_nationkey AS BIGINT) AS k,
        |       n_name AS name FROM nation
        |UNION ALL
        |SELECT 'skip_pass', CAST(r_regionkey AS BIGINT), r_name FROM region
        |UNION ALL
        |SELECT 'guard_fail', CAST(-1 AS BIGINT), 'caught'
        |ORDER BY src, k""".stripMargin) { (s, dir) =>
      import graft.ops.Sorting
      val guarded = Sorting.limitGuard(Tables.nation(s, dir), 100)
        .select(lit("guard_pass").as("src"),
          col("n_nationkey").cast("long").as("k"), col("n_name").as("name"))
      val skipPass = Sorting.limitSkip(Tables.region(s, dir), 100)
        .select(lit("skip_pass").as("src"),
          col("r_regionkey").cast("long").as("k"), col("r_name").as("name"))
      val skipOut = Sorting.limitSkip(Tables.customer(s, dir), 10)
        .select(lit("skip_exceeded").as("src"),
          col("c_custkey").cast("long").as("k"), col("c_name").as("name"))
      val failMarker =
        try {
          Sorting.limitGuard(Tables.customer(s, dir), 10)
          // wrong path: the guard should have thrown — contribute nothing,
          // so the oracle's one guard_fail row reads as a red mismatch
          s.range(0).select(lit("guard_missed").as("src"),
            lit(-2L).as("k"), lit("x").as("name"))
        } catch { case _: IllegalStateException =>
          s.range(1).select(lit("guard_fail").as("src"),
            lit(-1L).as("k"), lit("caught").as("name"))
        }
      guarded.unionByName(skipPass).unionByName(skipOut)
        .unionByName(failMarker).orderBy(col("src"), col("k"))
    },

    // ---- NWAYDISTRIBUTE (TAKnwaydistribute :1086): predicate-routed
    // distribution with an exact partitioner. The oracle recomputes the
    // routing function in SQL and compares against the partition each row
    // ACTUALLY landed in (spark_partition_id over the routed RDD) — routing
    // is verified row-by-row, replicate-all as the nation × partitions
    // cross product.
    QueryDef("q231_nway_distribute",
      """SELECT 'route' AS mode, n_nationkey AS key,
        |       CAST(n_regionkey % 4 AS INTEGER) AS part FROM nation
        |UNION ALL
        |SELECT 'replicate', n_nationkey, CAST(p.part AS INTEGER)
        |FROM nation CROSS JOIN (VALUES (0),(1),(2),(3)) p(part)
        |ORDER BY mode, key, part""".stripMargin) { (s, dir) =>
      val nation = Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_regionkey"))
      val routed = Distribute.nwayRouted(nation, col("n_regionkey"), 4)
        .select(lit("route").as("mode"), col("n_nationkey").as("key"),
          spark_partition_id().as("part"))
      val repl = Distribute.nwayRouted(nation, col("n_regionkey"), 4,
          replicateAll = true)
        .select(lit("replicate").as("mode"), col("n_nationkey").as("key"),
          spark_partition_id().as("part"))
      routed.unionByName(repl)
        .orderBy(col("mode"), col("key"), col("part"))
    },

    // ---- APPLY (TAKapply :904): per-row side effect. The effect is made
    // oracle-checkable through order-independent accumulators (count + key
    // sum — commutative, so distributed visit order can't flake the gate):
    // apply_ must visit every row exactly once for the read-back row to
    // match SELECT count(*), sum(s_suppkey).
    QueryDef("q232_apply",
      """SELECT CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(s_suppkey) AS BIGINT) AS key_sum
        |FROM supplier""".stripMargin) { (s, dir) =>
      import graft.model.GraftFrame
      val cnt = s.sparkContext.longAccumulator("apply_cnt")
      val keySum = s.sparkContext.longAccumulator("apply_sum")
      val sup = Tables.supplier(s, dir).select(col("s_suppkey").cast("long"))
      GraftFrame(sup).apply_ { r => cnt.add(1); keySum.add(r.getLong(0)) }
      s.range(1).select(lit(cnt.value.longValue).as("cnt"),
        lit(keySum.value.longValue).as("key_sum"))
    }
  )
}
