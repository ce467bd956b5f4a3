package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.TemporalJoins
import graft.io.TableIO

/**
 * Temporal join queries over the events table — the as-of and bounded
 * range joins of ext/TemporalJoins (operators beyond the reference's
 * equi-join-only surface, SURVEY.md §2.5/§2.11).
 */
object TemporalQueries {

  val all: Seq[Q] = Seq(

    // As-of join: each purchase annotated with the latest signup at or
    // before it for the same user. Oracle = DuckDB's NATIVE ASOF JOIN —
    // the engine's union-tag window formulation must reproduce it row
    // for row. Output carries the matched timestamp (order-independent
    // max), not a payload column, so ties cannot make the result depend
    // on intra-tie ordering in either engine.
    Q("asof_join",
      (s, dir) => {
        val ev = TableIO.read(s, dir, "events")
        TemporalJoins.asofBackward(
            ev.filter(col("event_type") === "purchase")
              .select("event_id", "user_id", "ts"),
            ev.filter(col("event_type") === "signup"),
            Seq("user_id"), "ts", "asof_ts")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            unix_micros(col("asof_ts")).as("asof_signup_us"))
          .orderBy("event_id")
      },
      Some("""SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
             |  epoch_us(r.ts) AS asof_signup_us
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') r
             |  ON l.user_id = r.user_id AND l.ts >= r.ts
             |ORDER BY l.event_id""".stripMargin)),

    // X7b — FORWARD as-of: for each signup, the user's next 'error' event
    // at or after it (the time-to-first-failure scan). Same union-tag
    // single-shuffle shape, min over the following frame.
    Q("asof_join_forward",
      (s, dir) => {
        val ev = TableIO.read(s, dir, "events")
        TemporalJoins.asofForward(
            ev.filter(col("event_type") === "signup")
              .select("event_id", "user_id", "ts"),
            ev.filter(col("event_type") === "error"),
            Seq("user_id"), "ts", "next_err_ts")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            unix_micros(col("next_err_ts")).as("next_error_us"))
          .orderBy("event_id")
      },
      Some("""SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
             |  epoch_us(r.ts) AS next_error_us
             |FROM (SELECT * FROM events WHERE event_type = 'signup') l
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
             |  ON l.user_id = r.user_id AND l.ts <= r.ts
             |ORDER BY l.event_id""".stripMargin)),

    // Bounded range join, aggregated: errors within 5 minutes AFTER each
    // purchase (same user), zero-match purchases kept. The engine side
    // decomposes the interval predicate into an equi-join on
    // (user, 5-minute bucket) + residual filter — the oracle states the
    // naive inequality join the decomposition must equal.
    Q("range_join_agg",
      (s, dir) => {
        val ev = TableIO.read(s, dir, "events")
        val win = 5L * 60L * 1000000L
        TemporalJoins.rangeJoinBucketed(
            ev.filter(col("event_type") === "purchase")
              .select("event_id", "user_id", "ts"),
            ev.filter(col("event_type") === "error")
              .select("event_id", "user_id", "ts", "value"),
            Seq("user_id"), "ts", win, joinType = "left_outer")
          .groupBy("event_id", "user_id", "ts")
          .agg(
            count(col("event_id_r")).as("n_errors"),
            coalesce(round(sum(col("value_r").cast("decimal(18,6)")).cast("double"), 6), lit(0.0))
              .as("err_value"))
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
            col("n_errors"), col("err_value"))
          .orderBy("event_id")
      },
      Some("""SELECT a.event_id, a.user_id, epoch_us(a.ts) AS ts_us,
             |  count(b.event_id) AS n_errors,
             |  round(CAST(coalesce(sum(CAST(b.value AS DECIMAL(18,6))), 0) AS DOUBLE), 6) AS err_value
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') a
             |LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') b
             |  ON a.user_id = b.user_id AND b.ts >= a.ts
             |     AND b.ts < a.ts + INTERVAL 5 MINUTE
             |GROUP BY a.event_id, a.user_id, a.ts
             |ORDER BY a.event_id""".stripMargin))
  )
}
