package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Agg, Sorting}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core slice (SURVEY §7.2): scan → filter → project → aggregate → sort →
  * limit. Each query has a DuckDB oracle; double aggregations route through
  * DECIMAL(25,6) on BOTH sides so results are bit-identical regardless of
  * summation order (see ops.Agg scaladoc).
  */
object CoreQueries {

  /** Exact double sum: identical formula on the Spark and DuckDB sides. */
  def sumD(c: Column, as: String): Column =
    sum(c.cast(DecimalType(25, 6))).cast("double").as(as)
  def sumDSql(expr: String, as: String): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS $as"

  /** Exact double avg: decimal sum and long count, divided as doubles. */
  def avgD(c: Column, as: String): Column =
    (sum(c.cast(DecimalType(25, 6))).cast("double") /
      count(c).cast("double")).as(as)
  def avgDSql(expr: String, as: String): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) / CAST(COUNT($expr) AS DOUBLE) AS $as"

  /** Tie-free decimal PRODUCTS (r16, caught by the full-210 sf1 oracle
    * sweep): Spark casts double→decimal through the value's SHORTEST
    * decimal representation (BigDecimal.valueOf → Double.toString) while
    * DuckDB rounds the exact binary expansion — for a product of clean
    * 2-dp monetary doubles the two can disagree by one unit of the target
    * scale when the product's shortest repr terminates exactly on a
    * rounding tie (rare per row: invisible at sf0.01, 1 group at sf1 in
    * q01, catastrophic after the var/corr cancellation in q14). A SINGLE
    * clean 2-dp column is tie-free (binary error ~1e-12 vs a tie 0.005
    * away), so the fix is to cast the FACTORS and multiply in DECIMAL:
    * exact, and bit-identical on both engines. Types are kept narrow so
    * neither engine's 38-digit cap forces a scale-reducing round. */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  /** l_extendedprice * (1 - l_discount), exact decimal — DECIMAL(18,4). */
  def revenueDec: Column =
    dec2(col("l_extendedprice")) *
      (lit(1).cast(DecimalType(4, 2)) - col("l_discount").cast(DecimalType(4, 2)))
  val revenueDecSql: String =
    "(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))"
  /** revenue * (1 + l_tax), exact decimal — DECIMAL(24,6). */
  def chargeDec: Column =
    revenueDec *
      (lit(1).cast(DecimalType(4, 2)) + col("l_tax").cast(DecimalType(4, 2)))
  val chargeDecSql: String =
    s"($revenueDecSql * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))))"
  /** l_extendedprice * l_discount (promo revenue), exact decimal. */
  def promoDec: Column =
    dec2(col("l_extendedprice")) * col("l_discount").cast(DecimalType(4, 2))
  val promoDecSql: String =
    "(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2)))"

  val defs: Seq[QueryDef] = Seq(

    // ---- TPC-H Q1 shape: the flagship spine (TAKdiskread+filter+
    // hashaggregate+sort; SURVEY §7.2) ------------------------------------
    QueryDef("q01_agg",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sumDSql("l_quantity", "sum_qty")},
         |  ${sumDSql("l_extendedprice", "sum_base_price")},
         |  ${sumDSql(revenueDecSql, "sum_disc_price")},
         |  ${sumDSql(chargeDecSql, "sum_charge")},
         |  ${avgDSql("l_quantity", "avg_qty")},
         |  ${avgDSql("l_extendedprice", "avg_price")},
         |  ${avgDSql("l_discount", "avg_disc")},
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Agg.table(
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp")),
        Seq(col("l_returnflag"), col("l_linestatus")),
        Seq(
          sumD(col("l_quantity"), "sum_qty"),
          sumD(col("l_extendedprice"), "sum_base_price"),
          sumD(revenueDec, "sum_disc_price"),
          sumD(chargeDec, "sum_charge"),
          avgD(col("l_quantity"), "avg_qty"),
          avgD(col("l_extendedprice"), "avg_price"),
          avgD(col("l_discount"), "avg_disc"),
          count(lit(1)).as("count_order")))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- TPC-H Q3 shape: 3-way join, grouped top-10 ----------------------
    // The plan to want at 100 TB: customer scales with SF (~1.5e10 rows at
    // 100 TB), so no forced broadcast — AQE picks broadcast vs shuffle by
    // measured post-filter size; revenue partially aggregates map-side; the
    // top-10 is TakeOrderedAndProject, not a global sort.
    QueryDef("q18_shipping_priority",
      s"""SELECT l_orderkey,
         |  ${sumDSql(revenueDecSql, "revenue")},
         |  CAST(o_orderdate AS DATE) AS odate
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         |  AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, odate, l_orderkey LIMIT 10""".stripMargin) {
      (s, dir) =>
      val cut = lit("1997-06-30 00:00:00").cast("timestamp")
      val c = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = Tables.orders(s, dir).filter(col("o_orderdate") < cut)
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > cut)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sumD(revenueDec, "revenue"))
        .select(col("l_orderkey"), col("revenue"),
          col("o_orderdate").cast("date").as("odate"))
        .orderBy(col("revenue").desc, col("odate"), col("l_orderkey"))
        .limit(10)
    },

    // ---- TPC-H Q5 shape: 6-way join, regional agg ------------------------
    // nation/region are genuinely fixed-size → forced broadcast; supplier
    // scales with SF, so AQE decides its join strategy at runtime.
    QueryDef("q19_supplier_volume",
      s"""SELECT n_name,
         |  ${sumDSql(revenueDecSql, "revenue")}
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) {
      (s, dir) =>
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val l = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sumD(revenueDec, "revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ---- filter + project with computed column (TAKfilter/TAKproject) ----
    QueryDef("q02_filter_project",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) AS net_price,
        |  l_returnflag
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_discount >= 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_quantity") > 45 && col("l_discount") >= 0.05)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"),
          col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- global scalar aggregates (no_count/sum/ave/max/min/variance) ----
    QueryDef("q03_scalar_agg",
      s"""SELECT COUNT(*) AS n_rows,
         |  ${sumDSql("o_totalprice", "sum_price")},
         |  CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
         |  CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
         |  COUNT(DISTINCT o_custkey) AS n_cust
         |FROM orders""".stripMargin) { (s, dir) =>
      Agg.scalar(Tables.orders(s, dir), Seq(
        count(lit(1)).as("n_rows"),
        sumD(col("o_totalprice"), "sum_price"),
        min(col("o_totalprice")).cast("double").as("min_price"),
        max(col("o_totalprice")).cast("double").as("max_price"),
        countDistinct(col("o_custkey")).as("n_cust")))
    },

    // ---- global stable sort (TAKsort :889) -------------------------------
    QueryDef("q04_sort",
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus = 'F'
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin) { (s, dir) =>
      Sorting.sort(
        Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority")),
        Seq(col("o_totalprice").desc, col("o_orderkey")))
    },

    // ---- TOPN (TAKtopn :936 — TakeOrderedAndProject, no global shuffle) --
    QueryDef("q05_topn",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, dir) =>
      Sorting.topn(
        Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice")),
        100, Seq(col("o_totalprice").desc, col("o_orderkey")))
    },

    // ---- grouped TOPN: top 3 orders per priority (window heap) -----------
    QueryDef("q06_topn_grouped",
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin) { (s, dir) =>
      Sorting.topnGrouped(
        Tables.orders(s, dir).select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")),
        3, Seq(col("o_orderpriority")),
        Seq(col("o_totalprice").desc, col("o_orderkey")))
        .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))
    },

    // ---- CHOOSEN with start offset (TAKfirstn :898) ----------------------
    QueryDef("q07_choosen",
      """SELECT c_custkey, c_name FROM customer
        |ORDER BY c_custkey LIMIT 50 OFFSET 10""".stripMargin) { (s, dir) =>
      Sorting.choosen(
        Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey")),
        50, start = 11)
    },

    // ---- SAMPLE: deterministic every-nth (TAKsample :899) ----------------
    QueryDef("q08_sample",
      """SELECT c_custkey, c_mktsegment FROM (
        |  SELECT c_custkey, c_mktsegment,
        |    ROW_NUMBER() OVER (ORDER BY c_custkey) AS rn
        |  FROM customer) WHERE (rn - 2) % 10 = 0
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Sorting.sample(
        Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment")),
        10, 2, Seq(col("c_custkey")))
    },

    // ---- ENTH: evenly-spaced num-out-of-den (TAKenth :913) ---------------
    QueryDef("q09_enth",
      """SELECT s_suppkey, s_name FROM (
        |  SELECT s_suppkey, s_name,
        |    ROW_NUMBER() OVER (ORDER BY s_suppkey) AS rn
        |  FROM supplier) WHERE (rn * 3) % 10 < 3
        |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      Sorting.enth(
        Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name")),
        3, 10, Seq(col("s_suppkey")))
    },

    // ---- QUANTILE boundary rows (TAKquantile :1082) ----------------------
    QueryDef("q10_quantile",
      """WITH ranked AS (
        |  SELECT o_totalprice,
        |    ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
        |    COUNT(*) OVER () AS cnt
        |  FROM orders)
        |SELECT o_totalprice, q.quantile
        |FROM ranked, (SELECT UNNEST(generate_series(1, 3)) AS quantile) q
        |WHERE rn = CEIL(q.quantile * cnt / 4)
        |ORDER BY q.quantile""".stripMargin) { (s, dir) =>
      Sorting.quantile(
        Tables.orders(s, dir).select(col("o_totalprice"), col("o_orderkey")),
        4, Seq(col("o_totalprice"), col("o_orderkey")))
        .select(col("o_totalprice"), col("quantile").cast("long").as("quantile"))
        .orderBy(col("quantile"))
    },

    // ---- grouped QUANTILE with FIRST/LAST (per-group boundary rows) ------
    QueryDef("q218_quantile_grouped",
      """WITH ranked AS (
        |  SELECT o_orderstatus, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice, o_orderkey) AS rn,
        |    COUNT(*) OVER (PARTITION BY o_orderstatus) AS cnt
        |  FROM orders)
        |SELECT o_orderstatus, q.quantile, o_totalprice
        |FROM ranked, (SELECT UNNEST(generate_series(0, 4)) AS quantile) q
        |WHERE (q.quantile = 0 AND rn = 1)
        |   OR (q.quantile = 4 AND rn = cnt)
        |   OR (q.quantile > 0 AND q.quantile < 4
        |       AND rn = CEIL(q.quantile * cnt / 4))
        |ORDER BY o_orderstatus, q.quantile""".stripMargin) { (s, dir) =>
      Sorting.quantileGrouped(
          Tables.orders(s, dir)
            .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey")),
          4, Seq(col("o_orderstatus")),
          Seq(col("o_totalprice"), col("o_orderkey")),
          first = true, last = true)
        .select(col("o_orderstatus"), col("quantile").cast("long").as("quantile"),
          col("o_totalprice"))
        .orderBy(col("o_orderstatus"), col("quantile"))
    },

    // ---- ds[n]: select nth row (TAKselectn :912) -------------------------
    QueryDef("q11_selectnth",
      """SELECT p_partkey, p_name FROM (
        |  SELECT p_partkey, p_name, ROW_NUMBER() OVER (ORDER BY p_partkey) AS rn
        |  FROM part) WHERE rn = 42""".stripMargin) { (s, dir) =>
      Sorting.selectNth(
        Tables.part(s, dir).select(col("p_partkey"), col("p_name")),
        42, Seq(col("p_partkey")))
    },

    // ---- CHOOSESETS: per-category quotas (TAKchoosesets :918) ------------
    QueryDef("q12_choosesets",
      """SELECT o_orderkey, o_orderstatus FROM (
        |  SELECT o_orderkey, o_orderstatus,
        |    ROW_NUMBER() OVER (PARTITION BY cat ORDER BY o_orderkey) AS rn,
        |    CASE cat WHEN 0 THEN 5 WHEN 1 THEN 10 ELSE 0 END AS quota
        |  FROM (
        |    SELECT o_orderkey, o_orderstatus,
        |      CASE WHEN o_orderstatus = 'F' THEN 0
        |           WHEN o_orderstatus = 'O' THEN 1 ELSE -1 END AS cat
        |    FROM orders) WHERE cat >= 0)
        |WHERE rn <= quota
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Sorting.choosesets(
        Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderstatus")),
        Seq((col("o_orderstatus") === "F", 5), (col("o_orderstatus") === "O", 10)),
        Seq(col("o_orderkey")))
        .orderBy(col("o_orderkey"))
    },

    // ---- DISTRIBUTION report (TAKdistribution :916) ----------------------
    QueryDef("q13_distribution",
      """SELECT o_orderpriority AS val, COUNT(*) AS cnt
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Agg.distribution(Tables.orders(s, dir), col("o_orderpriority"), "val")
        .orderBy(col("val"))
    }
  )
}
