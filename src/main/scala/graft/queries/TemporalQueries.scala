package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Temporal
import org.apache.spark.sql.functions._
import graft.queries.CoreQueries.avgDSql

/** AS-OF join gates over the events stream (see [[graft.ops.Temporal]]
  * for the union-merge lowering). DuckDB's native `ASOF JOIN` is the
  * oracle, so the gate proves latest-at-or-before semantics — including
  * exact-tie inclusion and left-outer null extension — not just row
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
    }
  )
}
