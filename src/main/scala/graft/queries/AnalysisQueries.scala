package graft.queries

import graft.{QueryDef, Tables}
import graft.analysis.DataPatterns
import org.apache.spark.sql.functions._

/** Std.DataPatterns oracle coverage: the profiler's scalar outputs are
  * re-derived in independent DuckDB SQL (fill contract, exact cardinality,
  * deterministic modes, palette patterns, numeric stats), and Benford's
  * first-digit distribution is recomputed digit-by-digit.
  */
object AnalysisQueries {

  private def attrProfileSql(col: String, isInt: Boolean): String = {
    val filled =
      if (isInt) s"$col IS NOT NULL AND $col <> 0"
      else s"$col IS NOT NULL AND length($col) > 0"
    val v = s"CAST($col AS VARCHAR)"
    s"""SELECT '$col' AS attribute,
       |  (SELECT CAST(count(*) AS BIGINT) FROM part) AS rec_count,
       |  (SELECT CAST(count(*) AS BIGINT) FROM part WHERE $filled)
       |    AS fill_count,
       |  (SELECT CAST(count(DISTINCT $col) AS BIGINT) FROM part
       |    WHERE $filled) AS cardinality,
       |  (SELECT CAST(min(length($v)) AS INTEGER) FROM part WHERE $filled)
       |    AS min_length,
       |  (SELECT CAST(max(length($v)) AS INTEGER) FROM part WHERE $filled)
       |    AS max_length,
       |  (SELECT floor(avg(length($v))) FROM part WHERE $filled)
       |    AS ave_length,
       |  (SELECT x.v FROM (SELECT $v AS v, count(*) AS c FROM part
       |    WHERE $filled GROUP BY 1 HAVING count(*) > 1
       |    ORDER BY c DESC, v ASC LIMIT 1) x) AS mode1,
       |  (SELECT CAST(x.c AS BIGINT) FROM (SELECT $v AS v, count(*) AS c
       |    FROM part WHERE $filled GROUP BY 1 HAVING count(*) > 1
       |    ORDER BY c DESC, v ASC LIMIT 1) x) AS mode1_cnt,
       |  (SELECT x.p FROM (SELECT regexp_replace(regexp_replace(
       |      regexp_replace(substr(v, 1, 100), '[A-Z]', 'A', 'g'),
       |      '[a-z]', 'a', 'g'), '[0-9]', '9', 'g') AS p, sum(c) AS sc
       |    FROM (SELECT $v AS v, count(*) AS c FROM part WHERE $filled
       |      GROUP BY 1) GROUP BY 1 ORDER BY sc DESC, p ASC LIMIT 1) x)
       |    AS pat1,
       |  (SELECT CAST(x.sc AS BIGINT) FROM (SELECT regexp_replace(
       |      regexp_replace(regexp_replace(substr(v, 1, 100),
       |      '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g'), '[0-9]', '9', 'g')
       |      AS p, sum(c) AS sc
       |    FROM (SELECT $v AS v, count(*) AS c FROM part WHERE $filled
       |      GROUP BY 1) GROUP BY 1 ORDER BY sc DESC, p ASC LIMIT 1) x)
       |    AS pat1_cnt,
       |  ${if (isInt)
          s"(SELECT round(min(CAST($col AS DOUBLE)), 6) FROM part WHERE $filled)"
        else "CAST(0.0 AS DOUBLE)"} AS num_min,
       |  ${if (isInt)
          s"(SELECT round(max(CAST($col AS DOUBLE)), 6) FROM part WHERE $filled)"
        else "CAST(0.0 AS DOUBLE)"} AS num_max,
       |  ${if (isInt)
          s"(SELECT round(avg(CAST($col AS DOUBLE)), 6) FROM part WHERE $filled)"
        else "CAST(0.0 AS DOUBLE)"} AS num_mean
       |""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- DataPatterns.Profile (Profile.ecl) ------------------------------
    QueryDef("q150_profile",
      Seq(("p_partkey", true), ("p_name", false), ("p_brand", false),
        ("p_size", true), ("p_type", false))
        .map { case (c, i) => attrProfileSql(c, i) }
        .mkString("", "UNION ALL\n", "ORDER BY attribute")) { (s, dir) =>
      val prof = DataPatterns.profile(
        Tables.part(s, dir).select("p_partkey", "p_name", "p_brand",
          "p_size", "p_type"),
        withCorrelations = false)
      prof.select(col("attribute"), col("rec_count"), col("fill_count"),
          col("cardinality"), col("min_length"), col("max_length"),
          col("ave_length"),
          try_element_at(col("modes"), lit(1)).getField("value").as("mode1"),
          try_element_at(col("modes"), lit(1)).getField("rec_count").as("mode1_cnt"),
          try_element_at(col("popular_patterns"), lit(1)).getField("data_pattern")
            .as("pat1"),
          try_element_at(col("popular_patterns"), lit(1)).getField("rec_count")
            .as("pat1_cnt"),
          round(col("numeric_min"), 6).as("num_min"),
          round(col("numeric_max"), 6).as("num_max"),
          round(col("numeric_mean"), 6).as("num_mean"))
        .orderBy("attribute")
    },

    // ---- DataPatterns.BestRecordStructure (BestRecordStructure.ecl:1-471):
    // fixed evidence table → the tightest RECORD + coercing TRANSFORM,
    // pinned line-for-line by the oracle (the q106 VALUES pattern; the
    // emission literals are the reference's own). ------------------------
    QueryDef("q78_best_record",
      """SELECT * FROM (VALUES
        |  (0, 'NewLayout := RECORD'),
        |  (1, '    UNSIGNED2 u;'),
        |  (2, '    INTEGER1 i;'),
        |  (3, '    BOOLEAN b;'),
        |  (4, '    REAL8 f;'),
        |  (5, '    STRING5 t;'),
        |  (6, 'END;'),
        |  (7, '//----------'),
        |  (8, 'OldLayout := RECORD'),
        |  (9, '    STRING u;'),
        |  (10, '    STRING i;'),
        |  (11, '    STRING b;'),
        |  (12, '    STRING f;'),
        |  (13, '    STRING t;'),
        |  (14, 'END;'),
        |  (15, '//----------'),
        |  (16, 'NewLayout Make_NewLayout(OldLayout r) := TRANSFORM'),
        |  (17, '    SELF.u := (UNSIGNED2)r.u;'),
        |  (18, '    SELF.i := (INTEGER1)r.i;'),
        |  (19, '    SELF.b := (BOOLEAN)r.b;'),
        |  (20, '    SELF.f := (REAL8)r.f;'),
        |  (21, '    SELF := r;'),
        |  (22, 'END;'),
        |  (23, '//----------'),
        |  (24, 'oldDS := DATASET([], OldLayout);'),
        |  (25, 'newDS := PROJECT(oldDS, Make_NewLayout(LEFT));')
        |) AS t(idx, s) ORDER BY idx""".stripMargin) { (s, dir) =>
      import s.implicits._
      val in = Seq(
        ("12", "-3", "true", "1.5", "abc"),
        ("345", "7", "false", "2.25", "defgh"),
        ("6", "-89", "true", "0.75", "ij")).toDF("u", "i", "b", "f", "t")
      DataPatterns.bestRecordStructure(in, emitTransform = true)
        .orderBy("idx")
    },

    // ---- DataPatterns.Benford (Benford.ecl numeric contracts: DECIMAL4_1
    // percentages, chi-squared FROM the rounded values at 3 dp, the
    // hardcoded expected table, 99% critical value on the expected row) ----
    QueryDef("q151_benford",
      """WITH digits AS (
        |  SELECT regexp_replace(regexp_replace(
        |      CAST(abs(l_extendedprice) AS VARCHAR), '[^0-9]', '', 'g'),
        |      '^0+', '') AS ds
        |  FROM lineitem),
        |lead AS (
        |  SELECT substr(ds, 1, 1) AS d FROM digits WHERE length(ds) >= 1),
        |n AS (SELECT count(*) AS total FROM lead),
        |obs AS (
        |  SELECT CAST(d AS INTEGER) AS d,
        |    round(count(*) * 100.0 / (SELECT total FROM n), 1) AS pct
        |  FROM lead GROUP BY 1),
        |expd(d, pct) AS (VALUES (1, 30.1), (2, 17.6), (3, 12.5), (4, 9.7),
        |  (5, 7.9), (6, 6.7), (7, 5.8), (8, 5.1), (9, 4.6)),
        |o AS (
        |  SELECT e.d, coalesce(obs.pct, 0.0) AS op, e.pct AS ep
        |  FROM expd e LEFT JOIN obs ON obs.d = e.d),
        |chi AS (SELECT round(sum((op - ep) * (op - ep) / ep), 3) AS v FROM o)
        |SELECT 'l_extendedprice' AS attribute,
        |  (SELECT op FROM o WHERE d = 1) AS d_1,
        |  (SELECT op FROM o WHERE d = 2) AS d_2,
        |  (SELECT op FROM o WHERE d = 3) AS d_3,
        |  (SELECT op FROM o WHERE d = 9) AS d_9,
        |  (SELECT v FROM chi) AS chi_squared,
        |  (SELECT CAST(total AS BIGINT) FROM n) AS num_values
        |UNION ALL
        |SELECT '--EXPECTED--', 30.1, 17.6, 12.5, 4.6, 20.09,
        |  CAST(0 AS BIGINT)
        |ORDER BY attribute""".stripMargin) { (s, dir) =>
      DataPatterns.benford(Tables.lineitem(s, dir), Seq("l_extendedprice"))
        .select(col("attribute"), col("d_1"), col("d_2"), col("d_3"),
          col("d_9"), col("chi_squared"), col("num_values"))
        .orderBy("attribute")
    },

    // ---- dataset quality contracts (batch ASSERT; expectations report) ---
    // Every predicate rule folds into ONE conditional-count aggregate over
    // ONE fact scan; uniqueness is one keyed aggregate; referential
    // integrity is one broadcast anti join. The report is rule-sized.
    QueryDef("q222_validate",
      """SELECT 'in_range:l_discount' AS rule,
        |  CAST((SELECT COUNT(*) FROM lineitem
        |        WHERE NOT (l_discount >= 0.0 AND l_discount <= 0.07)) AS BIGINT)
        |  AS n_violations
        |UNION ALL
        |SELECT 'not_null:l_orderkey',
        |  CAST((SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL) AS BIGINT)
        |UNION ALL
        |SELECT 'positive_extended_price',
        |  CAST((SELECT COUNT(*) FROM lineitem WHERE NOT (l_extendedprice > 0)) AS BIGINT)
        |UNION ALL
        |SELECT 'ref:l_orderkey->o_orderkey',
        |  CAST((SELECT COUNT(*) FROM lineitem
        |        WHERE l_orderkey IS NOT NULL
        |          AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT)
        |UNION ALL
        |SELECT 'unique:l_orderkey,l_linenumber',
        |  CAST((SELECT COUNT(*) FROM lineitem) -
        |       (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber
        |                              FROM lineitem)) AS BIGINT)
        |ORDER BY rule""".stripMargin) { (s, dir) =>
      import graft.analysis.Validate
      Validate.report(Tables.lineitem(s, dir), Seq(
          Validate.inRange("l_discount", 0.0, 0.07),
          Validate.notNull("l_orderkey"),
          Validate.satisfies("positive_extended_price", col("l_extendedprice") > 0),
          Validate.refIntegrity("l_orderkey", Tables.orders(s, dir), "o_orderkey"),
          Validate.unique("l_orderkey", "l_linenumber")))
    }
  )
}
