package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Ranges, Temporal}
import org.apache.spark.sql.functions._
import graft.queries.CoreQueries.avgDSql

/** AS-OF and range-join gates over the events stream (see
  * [[graft.ops.Temporal]] / [[graft.ops.Ranges]] for the lowerings).
  * DuckDB is the oracle — native `ASOF JOIN` for q205–q207, plain
  * inequality joins for q208/q209 — so the gates prove the semantics
  * (tie inclusion, half-open bounds, pair uniqueness), not just row
  * counts.
  */
object TemporalQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- q205: backward as-of join, left outer ---------------------------
    // Every purchase matched to the user's most recent at-or-before click;
    // purchases with no prior click survive with null match columns.
    QueryDef("q205_asof_join",
      """WITH clicks AS (
        |  SELECT user_id, ts, value AS click_value FROM events
        |  WHERE event_type = 'click'),
        |pur AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT pur.event_id, pur.user_id, pur.ts,
        |  clicks.ts AS matched_ts, clicks.click_value
        |FROM pur ASOF LEFT JOIN clicks
        |  ON pur.user_id = clicks.user_id AND pur.ts >= clicks.ts
        |ORDER BY pur.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value").as("click_value"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      Temporal.asofJoin(pur, clicks, "user_id", "ts", "ts",
          Seq("click_value"))
        .orderBy(col("event_id"))
    },

    // ---- q206: as-of join with a staleness tolerance ---------------------
    // Same match, but a click older than 30 minutes no longer counts (the
    // "quote too stale" guard) — the match nulls out rather than falling
    // back to an even older row, which is what ASOF + CASE expresses.
    QueryDef("q206_asof_tolerance",
      """WITH clicks AS (
        |  SELECT user_id, ts, value AS click_value FROM events
        |  WHERE event_type = 'click'),
        |pur AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT pur.event_id, pur.user_id, pur.ts,
        |  CASE WHEN clicks.ts >= pur.ts - INTERVAL 30 MINUTE
        |       THEN clicks.ts END AS matched_ts,
        |  CASE WHEN clicks.ts >= pur.ts - INTERVAL 30 MINUTE
        |       THEN clicks.click_value END AS click_value
        |FROM pur ASOF LEFT JOIN clicks
        |  ON pur.user_id = clicks.user_id AND pur.ts >= clicks.ts
        |ORDER BY pur.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value").as("click_value"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      Temporal.asofJoin(pur, clicks, "user_id", "ts", "ts",
          Seq("click_value"), toleranceSec = Some(1800L))
        .orderBy(col("event_id"))
    },

    // ---- q207: feature-staleness profile ---------------------------------
    // The freshness report a feature store publishes: per event type, how
    // old the most recent prior click is on average.
    QueryDef("q207_asof_staleness",
      s"""WITH clicks AS (
         |  SELECT user_id, ts FROM events WHERE event_type = 'click'),
         |ev AS (
         |  SELECT event_id, user_id, ts, event_type FROM events
         |  WHERE event_type <> 'click')
         |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_matched,
         |  ${avgDSql("(epoch_us(ev.ts) - epoch_us(clicks.ts)) / 1000000.0", "avg_age_s")}
         |FROM ev ASOF JOIN clicks
         |  ON ev.user_id = clicks.user_id AND ev.ts >= clicks.ts
         |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"))
      val rest = ev.filter(col("event_type") =!= "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      Temporal.asofStaleness(rest, clicks, "user_id", "ts", "ts", "event_type")
        .orderBy(col("event_type"))
    },

    // ---- q216: forward as-of join (conversion tracking) ------------------
    // For each signup, the user's FIRST purchase at-or-after it — the
    // next-event direction (order→fill, signup→conversion). Same
    // union-merge lowering scanning descending.
    QueryDef("q216_asof_forward",
      """WITH pur AS (
        |  SELECT user_id, ts, value AS purchase_value FROM events
        |  WHERE event_type = 'purchase'),
        |sup AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'signup')
        |SELECT sup.event_id, sup.user_id, sup.ts,
        |  pur.ts AS matched_ts, pur.purchase_value
        |FROM sup ASOF LEFT JOIN pur
        |  ON sup.user_id = pur.user_id AND sup.ts <= pur.ts
        |ORDER BY sup.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
      val sup = ev.filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("ts"))
      Temporal.asofJoin(sup, pur, "user_id", "ts", "ts",
          Seq("purchase_value"), forward = true)
        .orderBy(col("event_id"))
    },

    // ---- q219: regular-grid resample with fill-forward -------------------
    // Each user's purchase history resampled onto a 7-day grid anchored at
    // their first purchase, carrying the last purchase value forward — the
    // irregular-events → fixed-step normalization before windowed feature
    // extraction. Oracle: epoch-micros grid + native ASOF.
    QueryDef("q219_resample_ffill",
      """WITH pur AS (
        |  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |span AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
        |  FROM pur GROUP BY user_id),
        |grid AS (
        |  SELECT user_id, make_timestamp(lo + i * 604800000000) AS tick
        |  FROM span, UNNEST(range(0, CAST(FLOOR((hi - lo) / 604800000000.0) AS BIGINT) + 1)) AS t(i))
        |SELECT grid.user_id, grid.tick,
        |  pur.ts AS matched_ts, pur.value
        |FROM grid ASOF LEFT JOIN pur
        |  ON grid.user_id = pur.user_id AND grid.tick >= pur.ts
        |ORDER BY grid.user_id, grid.tick""".stripMargin) { (s, dir) =>
      val pur = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      Temporal.resampleFfill(pur, "user_id", "ts", Seq("value"), 604800L)
        .orderBy(col("user_id"), col("tick"))
    },

    // ---- q220: SCD type-2 history build ----------------------------------
    // Each user's event-type stream collapsed to validity intervals: one
    // row per run of unchanged type, effective_to = next run's start
    // (null while current) — the dimension-history shape every warehouse
    // maintains.
    QueryDef("q220_scd2_history",
      """WITH obs AS (
        |  SELECT user_id, ts, event_type,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM events),
        |runs AS (
        |  SELECT user_id, event_type, ts AS effective_from
        |  FROM obs WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type, effective_from,
        |  LEAD(effective_from) OVER (PARTITION BY user_id
        |    ORDER BY effective_from) AS effective_to
        |FROM runs ORDER BY user_id, effective_from""".stripMargin) { (s, dir) =>
      Temporal.scdType2(
          Tables.events(s, dir).select(col("user_id"), col("ts"), col("event_type")),
          "user_id", "ts", Seq("event_type"))
        .select(col("user_id"), col("event_type"), col("effective_from"),
          col("effective_to"))
        .orderBy(col("user_id"), col("effective_from"))
    },

    // ---- q208: point-in-interval range join ------------------------------
    // Each error opens a 30-minute incident window; count the clicks
    // falling inside each (half-open, no user key — the shape Spark would
    // otherwise BNLJ). The bucketed lowering equi-joins on the window's
    // bucket id instead.
    QueryDef("q208_range_join",
      """WITH win AS (
        |  SELECT event_id AS win_id, ts AS w_start,
        |         ts + INTERVAL 30 MINUTE AS w_end
        |  FROM events WHERE event_type = 'error'),
        |clk AS (SELECT ts FROM events WHERE event_type = 'click')
        |SELECT win_id, CAST(COUNT(*) AS BIGINT) AS n_clicks
        |FROM win JOIN clk ON clk.ts >= win.w_start AND clk.ts < win.w_end
        |GROUP BY win_id ORDER BY win_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val win = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("win_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))
      val clk = ev.filter(col("event_type") === "click").select(col("ts"))
      Ranges.pointInInterval(clk, win, "ts", "w_start", "w_end", 1800L)
        .groupBy(col("win_id")).agg(count(lit(1)).as("n_clicks"))
        .orderBy(col("win_id"))
    },

    // ---- q209: interval-overlap range join -------------------------------
    // 30-minute incident windows × 60-minute signup-activity windows:
    // overlapping pairs counted exactly once each (the max-start-bucket
    // uniqueness trick — no distinct), aggregated per incident.
    QueryDef("q209_interval_overlap",
      """WITH a AS (
        |  SELECT event_id AS a_id, ts AS a_start,
        |         ts + INTERVAL 30 MINUTE AS a_end
        |  FROM events WHERE event_type = 'error'),
        |b AS (
        |  SELECT ts AS b_start, ts + INTERVAL 60 MINUTE AS b_end
        |  FROM events WHERE event_type = 'signup')
        |SELECT a_id, CAST(COUNT(*) AS BIGINT) AS n_overlaps
        |FROM a JOIN b ON a_start < b_end AND b_start < a_end
        |GROUP BY a_id ORDER BY a_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val a = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("a_id"), col("ts").as("a_start"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("a_end"))
      val b = ev.filter(col("event_type") === "signup")
        .select(col("ts").as("b_start"),
          (col("ts") + expr("INTERVAL 60 MINUTES")).as("b_end"))
      // r19: the grouped count never needs the overlapping-pair product —
      // the boundary-sweep form shuffles 2|a|+2|b| narrow rows instead of
      // materializing every pair (pair density grows quadratically with
      // SF here: both interval sets share the fixed time range, so each
      // 10× SF bump makes ~100× pairs; the sweep stays linear).
      Ranges.intervalOverlapCounts(a, Seq("a_id"), "a_start", "a_end",
          b, "b_start", "b_end", "n_overlaps")
        .orderBy(col("a_id"))
    }
  )
}
