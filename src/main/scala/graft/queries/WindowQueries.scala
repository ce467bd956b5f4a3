package graft.queries

import graft.ext.StreamingOps
import graft.io.TableIO

/**
 * §2.10 — event-time windowing over the events table (batch form of the
 * Structured Streaming surface; the identical lineage runs on readStream).
 */
object WindowQueries {

  private val DecimalSumSql = "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)"

  val all: Seq[Q] = Seq(

    Q("tumbling_window",
      (s, dir) => StreamingOps.tumbling(TableIO.read(s, dir, "events"), "ts", "1 hour", "event_type")
        .orderBy("w_start_us", "event_type"),
      Some(s"""SELECT epoch_us(date_trunc('hour', ts)) AS w_start_us, event_type,
              |  count(*) AS n, $DecimalSumSql AS v
              |FROM events
              |GROUP BY 1, 2
              |ORDER BY 1, 2""".stripMargin)),

    Q("sliding_window",
      (s, dir) => StreamingOps.sliding(TableIO.read(s, dir, "events"), "ts", "1 hour", "30 minutes", "event_type")
        .orderBy("w_start_us", "event_type"),
      Some(s"""WITH x AS (
              |  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
              |                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws,
              |         event_type, value
              |  FROM events)
              |SELECT epoch_us(ws) AS w_start_us, event_type, count(*) AS n, $DecimalSumSql AS v
              |FROM x
              |GROUP BY 1, 2
              |ORDER BY 1, 2""".stripMargin)),

    // Session semantics: a session covers [first, last+gap); an event at
    // exactly prev+gap starts a new session (window end is exclusive), so
    // the oracle's break condition is >=, mirroring Spark session_window.
    Q("session_window",
      (s, dir) => StreamingOps.sessionized(TableIO.read(s, dir, "events"), "ts", "30 minutes", "user_id")
        .orderBy("user_id", "session_start_us"),
      Some(s"""WITH o AS (
              |  SELECT user_id, ts, value,
              |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
              |  FROM events),
              |m AS (
              |  SELECT *, CASE WHEN prev IS NULL OR ts - prev >= INTERVAL '30 minutes'
              |                 THEN 1 ELSE 0 END AS brk
              |  FROM o),
              |g AS (
              |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
              |                           ROWS UNBOUNDED PRECEDING) AS sid
              |  FROM m)
              |SELECT user_id,
              |  epoch_us(min(ts)) AS session_start_us,
              |  epoch_us(max(ts)) + 1800000000 AS session_end_us,
              |  count(*) AS n, $DecimalSumSql AS v
              |FROM g
              |GROUP BY user_id, sid
              |ORDER BY user_id, session_start_us""".stripMargin))
  )
}
