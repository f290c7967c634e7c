package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Joins
import org.apache.spark.sql.functions._
import graft.queries.CoreQueries.{sumD, sumDSql, revenueDec, revenueDecSql}

/** The join family (SURVEY §2.4): inner/left/full/only types, LOOKUP
  * first-match, KEEP(n), ATMOST(n), ALL (non-equi), self-join,
  * DENORMALIZE(GROUP). Each with a DuckDB oracle.
  */
object JoinQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- global join + agg (TAKjoin/TAKhashjoin — SortMergeJoin) ---------
    QueryDef("q20_join_inner",
      s"""SELECT c_nationkey, COUNT(*) AS n_orders,
         |  ${sumDSql("o_totalprice", "sum_price")}
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir); val c = Tables.customer(s, dir)
      Joins.join(o, c, o("o_custkey") === c("c_custkey"), Joins.Inner)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"), sumD(col("o_totalprice"), "sum_price"))
        .orderBy(col("c_nationkey"))
    },

    // ---- LEFT OUTER (JFleftouter :1714) ----------------------------------
    QueryDef("q21_join_left",
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir); val o = Tables.orders(s, dir)
      Joins.join(c, o, c("c_custkey") === o("o_custkey"), Joins.LeftOuter)
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    },

    // ---- FULL OUTER ------------------------------------------------------
    QueryDef("q22_join_full",
      """WITH big AS (
        |  SELECT o_custkey, COUNT(*) AS n_big FROM orders
        |  WHERE o_totalprice > 150000 GROUP BY o_custkey),
        |poor AS (
        |  SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal FROM customer
        |  WHERE c_acctbal < 1000)
        |SELECT COALESCE(o_custkey, c_custkey) AS custkey, n_big, acctbal
        |FROM big FULL JOIN poor ON o_custkey = c_custkey
        |ORDER BY custkey""".stripMargin) { (s, dir) =>
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 150000)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big"))
      val poor = Tables.customer(s, dir).filter(col("c_acctbal") < 1000)
        .select(col("c_custkey"), col("c_acctbal").cast("double").as("acctbal"))
      Joins.join(big, poor, big("o_custkey") === poor("c_custkey"), Joins.FullOuter)
        .select(coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
          col("n_big"), col("acctbal"))
        .orderBy(col("custkey"))
    },

    // ---- LEFT ONLY = anti join (JFexclude :1716) -------------------------
    QueryDef("q23_join_leftonly",
      """SELECT p_partkey FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_partkey = p_partkey AND l_quantity > 48)
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      val p = Tables.part(s, dir)
      val li = Tables.lineitem(s, dir).filter(col("l_quantity") > 48)
      Joins.join(p, li, p("p_partkey") === li("l_partkey"), Joins.LeftOnly)
        .select(col("p_partkey")).orderBy(col("p_partkey"))
    },

    // ---- RIGHT ONLY ------------------------------------------------------
    QueryDef("q24_join_rightonly",
      """SELECT s_suppkey FROM supplier
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_suppkey = s_suppkey AND l_extendedprice > 80000)
        |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir).filter(col("l_extendedprice") > 80000)
      val sup = Tables.supplier(s, dir)
      Joins.rightOnly(li, sup, li("l_suppkey") === sup("s_suppkey"))
        .select(col("s_suppkey")).orderBy(col("s_suppkey"))
    },

    // ---- LOOKUP non-MANY: broadcast + FIRST match per key
    // (TAKlookupjoin :1044, JFmanylookup :1732 absent) ----------------------
    QueryDef("q25_lookup_first",
      """SELECT c_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS first_price
        |FROM customer JOIN (
        |  SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |    SELECT o_custkey, o_orderkey, o_totalprice,
        |      ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
        |    FROM orders) WHERE rn = 1) o
        |ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      Joins.lookupJoinFirst(c, o, Seq("o_custkey"), Seq(col("o_orderkey")),
          c("c_custkey") === o("o_custkey"))
        .select(col("c_custkey"), col("o_orderkey"),
          col("o_totalprice").cast("double").as("first_price"))
        .orderBy(col("c_custkey"))
    },

    // ---- KEEP(2) (getKeepLimit :1771) ------------------------------------
    QueryDef("q26_join_keep2",
      """SELECT c_custkey, o_orderkey FROM (
        |  SELECT c_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY o_orderkey) AS rn
        |  FROM customer JOIN orders ON o_custkey = c_custkey)
        |WHERE rn <= 2 ORDER BY c_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir); val o = Tables.orders(s, dir)
      val joined = Joins.join(c, o, c("c_custkey") === o("o_custkey"), Joins.Inner)
      Joins.keepN(joined, Seq(col("c_custkey")), Seq(col("o_orderkey")), 2)
        .select(col("c_custkey"), col("o_orderkey"))
        .orderBy(col("c_custkey"), col("o_orderkey"))
    },

    // ---- ATMOST(n): keys matching more than n RHS rows match NOTHING
    // (getMatchAbortLimit :1772 — not a truncation!) ------------------------
    QueryDef("q27_join_atmost",
      """SELECT p_partkey, COUNT(*) AS n FROM part JOIN (
        |  SELECT l_partkey FROM lineitem
        |  QUALIFY COUNT(*) OVER (PARTITION BY l_partkey) <= 30) l
        |ON p_partkey = l_partkey
        |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      val p = Tables.part(s, dir)
      val li = Joins.atmostRhs(
        Tables.lineitem(s, dir).select(col("l_partkey")), Seq("l_partkey"), 30)
      Joins.join(p, li, p("p_partkey") === li("l_partkey"), Joins.Inner)
        .groupBy(col("p_partkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("p_partkey"))
    },

    // ---- JOIN ALL: non-equi nested-loop over replicated RHS
    // (TAKalljoin :1047 → BroadcastNestedLoopJoin) --------------------------
    QueryDef("q28_all_join",
      """SELECT s_suppkey, COUNT(c_custkey) AS n_close
        |FROM supplier LEFT JOIN customer
        |  ON c_acctbal BETWEEN s_acctbal - 10 AND s_acctbal
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      val sup = Tables.supplier(s, dir); val c = Tables.customer(s, dir)
      Joins.allJoin(sup, c,
          c("c_acctbal") >= sup("s_acctbal") - 10 &&
          c("c_acctbal") <= sup("s_acctbal"), Joins.LeftOuter)
        .groupBy(col("s_suppkey")).agg(count(col("c_custkey")).as("n_close"))
        .orderBy(col("s_suppkey"))
    },

    // ---- DENORMALIZE(GROUP): matches nested as a child rowset
    // (TAKdenormalizegroup :1068) ------------------------------------------
    QueryDef("q29_denorm_group",
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir).select(col("c_custkey"))
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      Joins.denormalizeGroup(c, o, c("c_custkey") === o("o_custkey"),
          "orders_child", o("o_orderkey"))
        .select(col("c_custkey"),
          size(col("orders_child")).cast("long").as("n_orders"),
          array_max(col("orders_child.o_totalprice")).cast("double").as("max_price"))
        .orderBy(col("c_custkey"))
    },

    // ---- self join (TAKselfjoin :1045) -----------------------------------
    QueryDef("q30_selfjoin",
      """SELECT a.n_nationkey AS nk1, b.n_nationkey AS nk2
        |FROM nation a JOIN nation b
        |  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
        |ORDER BY nk1, nk2""".stripMargin) { (s, dir) =>
      val a = Tables.nation(s, dir).alias("a")
      val b = Tables.nation(s, dir).alias("b")
      a.join(b, col("a.n_regionkey") === col("b.n_regionkey") &&
          col("a.n_nationkey") < col("b.n_nationkey"))
        .select(col("a.n_nationkey").as("nk1"), col("b.n_nationkey").as("nk2"))
        .orderBy(col("nk1"), col("nk2"))
    },

    // ---- star join: fact ⋈ broadcast dims (the 100 TB headline shape) ----
    QueryDef("q31_star_join",
      s"""SELECT p_brand, n_name, COUNT(*) AS n_items,
         |  ${sumDSql(revenueDecSql, "revenue")}
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_size <= 15
         |GROUP BY p_brand, n_name ORDER BY p_brand, n_name""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir).filter(col("p_size") <= 15)
      val sup = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .groupBy(col("p_brand"), col("n_name"))
        .agg(count(lit(1)).as("n_items"),
          sumD(revenueDec, "revenue"))
        .orderBy(col("p_brand"), col("n_name"))
    },

    // ---- N-way MERGEJOIN MOFN(2): custkeys present in >=2 of 3 streams ---
    QueryDef("q32_mergejoin_mofn",
      """WITH i0 AS (SELECT o_orderkey, o_custkey, 0 AS src FROM orders
        |            WHERE o_orderstatus = 'F'),
        |i1 AS (SELECT o_orderkey, o_custkey, 1 AS src FROM orders
        |       WHERE o_totalprice > 150000),
        |i2 AS (SELECT o_orderkey, o_custkey, 2 AS src FROM orders
        |       WHERE o_orderpriority = '1-URGENT'),
        |all_rows AS (SELECT * FROM i0 UNION ALL SELECT * FROM i1
        |             UNION ALL SELECT * FROM i2),
        |q AS (SELECT o_custkey FROM (
        |        SELECT DISTINCT o_custkey, src FROM all_rows)
        |      GROUP BY o_custkey HAVING COUNT(*) >= 2)
        |SELECT o_orderkey, o_custkey, src FROM all_rows
        |WHERE o_custkey IN (SELECT o_custkey FROM q)
        |ORDER BY o_custkey, o_orderkey, src""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderpriority"))
      def stream(f: org.apache.spark.sql.Column, src: Int) =
        o.filter(f).select(col("o_orderkey"), col("o_custkey"),
          lit(src).as("src"))
      val inputs = Seq(
        stream(col("o_orderstatus") === "F", 0),
        stream(col("o_totalprice") > 150000, 1),
        stream(col("o_orderpriority") === "1-URGENT", 2))
      Joins.mergeJoinMofN(inputs, Seq("o_custkey"), 2)
        .select(col("o_orderkey"), col("o_custkey"), col("src"))
        .orderBy(col("o_custkey"), col("o_orderkey"), col("src"))
    },

    // ---- N-way MERGEJOIN, proximity/STEPPED range variant ----------------
    // Three event streams; an event qualifies when all 3 streams have an
    // event within ±2 ids of it. The oracle states the semantics as the
    // naive range self-join; the engine's lowering is the banded equality
    // join in Joins.mergeJoinProximity (no cartesian — PlanAuditSpec).
    QueryDef("q33_mergejoin_proximity",
      """WITH t AS (
        |  SELECT event_id, 0 AS src FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT event_id, 1 FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT event_id, 2 FROM events WHERE event_type = 'error')
        |SELECT t.event_id, t.src
        |FROM t JOIN t p ON p.event_id BETWEEN t.event_id - 2
        |                                  AND t.event_id + 2
        |GROUP BY t.event_id, t.src HAVING count(DISTINCT p.src) >= 3
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir).select(col("event_id"), col("event_type"))
      def stream(t: String) =
        e.filter(col("event_type") === t).select(col("event_id"))
      Joins.mergeJoinProximity(
          Seq(stream("click"), stream("purchase"), stream("error")),
          "event_id", 2L, 3)
        .select(col("event_id"), col("__src").cast("int").as("src"))
        .orderBy(col("event_id"), col("src"))
    }
  )
}
