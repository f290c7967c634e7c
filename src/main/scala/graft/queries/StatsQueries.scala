package graft.queries

import graft.{QueryDef, Tables}
import graft.agg.Aggregators
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.queries.CoreQueries.{sumD, sumDSql}

/** Statistical aggregates (no_variance/covariance/correlation
  * `ecl/hql/hqlexpr.hpp:634-636`), bitwise ops (no_band/bor/bxor/lshift/
  * rshift :389-418), skew-salted aggregation (§2.9), and the typed
  * Aggregator UDAF surface (§2.5).
  */
object StatsQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- VARIANCE / COVARIANCE / CORRELATION from decimal-exact moment
    // sums — the same closed formula on both sides, so doubles match
    // bit-for-bit (built-in var_pop uses engine-specific update orders) ----
    QueryDef("q14_stats",
      """WITH m AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(SUM(CAST(CAST(o_custkey AS DOUBLE) AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(CAST(CAST(o_custkey AS DECIMAL(19,0)) * CAST(o_custkey AS DECIMAL(19,0)) AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE) AS syy,
        |    CAST(CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_custkey AS DECIMAL(19,0)) AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM orders)
        |SELECT n,
        |  (sxx - sx * sx / n) / n AS var_x,
        |  (syy - sy * sy / n) / n AS var_y,
        |  (sxy - sx * sy / n) / n AS covar_xy,
        |  ((sxy - sx * sy / n) / n) /
        |    (sqrt((sxx - sx * sx / n) / n) * sqrt((syy - sy * sy / n) / n)) AS corr_xy
        |FROM m""".stripMargin) { (s, dir) =>
      val x = col("o_totalprice")
      val y = col("o_custkey").cast("double")
      // products are computed in DECIMAL from 2dp-clean / integer factors
      // (see CoreQueries.dec2 scaladoc): the double-product→decimal cast
      // tie that diverged Spark and DuckDB at sf1 can't occur, and the
      // var/corr cancellation below no longer amplifies it
      val xd = x.cast(DecimalType(12, 2))
      val yd = col("o_custkey").cast(DecimalType(19, 0))
      val m = Tables.orders(s, dir).agg(
        count(lit(1)).as("n"),
        sum(x.cast(DecimalType(25, 6))).cast("double").as("sx"),
        sum((xd * xd).cast(DecimalType(30, 4))).cast("double").as("sxx"),
        sum(y.cast(DecimalType(25, 6))).cast("double").as("sy"),
        sum((yd * yd).cast(DecimalType(30, 4))).cast("double").as("syy"),
        sum((xd * yd).cast(DecimalType(30, 4))).cast("double").as("sxy"))
      val n = col("n"); val sx = col("sx"); val sxx = col("sxx")
      val sy = col("sy"); val syy = col("syy"); val sxy = col("sxy")
      val varX = (sxx - sx * sx / n) / n
      val varY = (syy - sy * sy / n) / n
      val covar = (sxy - sx * sy / n) / n
      m.select(n, varX.as("var_x"), varY.as("var_y"), covar.as("covar_xy"),
        (covar / (sqrt(varX) * sqrt(varY))).as("corr_xy"))
    },

    // ---- bitwise/shift surface -------------------------------------------
    QueryDef("q15_bitwise",
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS band,
        |  o_orderkey | 4096 AS bor,
        |  xor(o_orderkey, 170) AS bxor,
        |  CAST(~o_orderkey AS BIGINT) AS bnot,
        |  o_orderkey << 3 AS lsh,
        |  o_orderkey >> 2 AS rsh,
        |  CAST(bit_count(o_orderkey) AS INTEGER) AS popcnt
        |FROM orders WHERE o_orderkey <= 4000 ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val k = col("o_orderkey")
      Tables.orders(s, dir).filter(k <= 4000)
        .select(k,
          k.bitwiseAND(255).as("band"),
          k.bitwiseOR(4096).as("bor"),
          k.bitwiseXOR(170).as("bxor"),
          bitwise_not(k).as("bnot"),
          shiftleft(k, 3).as("lsh"),
          shiftright(k, 2).as("rsh"),
          bit_count(k).as("popcnt"))
        .orderBy(k)
    },

    // ---- skew-salted two-phase aggregation (§2.9 salting): partial agg on
    // (key, salt) spreads hot keys, then final merge on key — identical
    // result to a direct GROUP BY, robust to key skew at 100 TB ------------
    QueryDef("q16_salted_agg",
      s"""SELECT l_partkey, COUNT(*) AS n,
         |  ${CoreQueries.sumDSql("l_quantity", "sum_qty")}
         |FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""".stripMargin) { (s, dir) =>
      import graft.queries.CoreQueries.sumD
      val salted = Tables.lineitem(s, dir)
        .withColumn("__salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(8)))
      val partial = salted.groupBy(col("l_partkey"), col("__salt"))
        .agg(count(lit(1)).as("pn"),
          sum(col("l_quantity").cast(DecimalType(25, 6))).as("psum"))
      partial.groupBy(col("l_partkey"))
        .agg(sum(col("pn")).as("n"),
          sum(col("psum")).cast("double").as("sum_qty"))
        .orderBy(col("l_partkey"))
    },

    // ---- typed Aggregator (IHThorRowAggregator contract): qty-weighted
    // average price per returnflag over exact micro-units ------------------
    QueryDef("q17_weighted_avg",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(CAST(l_extendedprice * l_quantity AS DECIMAL(25,6)) * 1000000 AS BIGINT)) AS DOUBLE)
        |  / CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(25,6)) * 1000000 AS BIGINT)) AS DOUBLE) AS wavg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val wavg = udaf(Aggregators.WeightedAvgMicros)
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          (col("l_extendedprice") * col("l_quantity"))
            .cast(DecimalType(25, 6)).*(1000000).cast("long").as("pq"),
          col("l_quantity").cast(DecimalType(25, 6)).*(1000000)
            .cast("long").as("q"))
        .groupBy(col("l_returnflag"))
        .agg(wavg(col("pq"), col("q")).as("wavg_price"))
        .orderBy(col("l_returnflag"))
    },

    // ---- grouping sets / ROLLUP (§2.5 "superset" row, now gated) ---------
    // Subtotal + grand-total rows in ONE aggregate pass (Spark expands the
    // grouping sets before the exchange — still a single shuffle);
    // grouping_id() disambiguates NULL-as-subtotal from NULL data.
    QueryDef("q212_rollup_sets",
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
         |  ${sumDSql("l_quantity", "sum_qty")},
         |  CAST(COUNT(*) AS BIGINT) AS n
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"),
          sumD(col("l_quantity"), "sum_qty"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
          col("sum_qty"), col("n"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
    },

    // ---- exact heavy hitters without a full-domain shuffle ---------------
    // Token frequencies ≥ 0.2% of the corpus: per-partition SpaceSaving
    // candidates (bounded memory, no false negatives) + exact recount of
    // the candidate sliver. The oracle is the plain exact HAVING — the
    // sketch must change NOTHING about the answer.
    QueryDef("q213_heavy_hitters",
      """WITH toks AS (
        |  SELECT UNNEST(string_split_regex(trim(text), '\s+')) AS k
        |  FROM documents),
        |tt AS (SELECT COUNT(*) AS total FROM toks WHERE k <> '')
        |SELECT k, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM toks, tt WHERE k <> ''
        |GROUP BY k, total HAVING COUNT(*) >= CEIL(total * 0.002)
        |ORDER BY k""".stripMargin) { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select(explode(split(trim(col("text")), "\\s+")).as("k"))
        .filter(col("k") =!= "")
      graft.ops.HeavyHitters.heavyHitters(toks, col("k"), 0.002)
        .orderBy(col("k"))
    }
  )
}
