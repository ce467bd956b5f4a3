package graft.queries

import org.apache.spark.sql.functions._

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

    // Conversion FUNNEL: users whose first 'view' is followed by a
    // 'purchase' within the attribution horizon. Two filtered min-aggs
    // (map-side combined) + one user-keyed join; per-user max(hit)
    // collapses multiple purchases before the scalar rollup — the
    // standard product-analytics scan, scale-stable output.
    Q("event_funnel",
      (s, dir) => {
        val e = TableIO.read(s, dir, "events").select(col("user_id"), col("ts"), col("event_type"))
        val firstView = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("v_ts"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_ts"))
        firstView.join(purchases, Seq("user_id"), "left_outer")
          .withColumn("hit",
            when(col("p_ts") >= col("v_ts") &&
              col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"), 1).otherwise(0))
          .groupBy("user_id").agg(max("hit").as("converted"))
          .agg(
            count(lit(1)).as("n_viewers"),
            sum("converted").cast("long").as("n_converted"))
      },
      Some("""WITH fv AS (
             |  SELECT user_id, min(ts) AS v_ts FROM events WHERE event_type = 'view' GROUP BY 1),
             |hits AS (
             |  SELECT fv.user_id,
             |         max(CASE WHEN p.ts >= fv.v_ts AND p.ts <= fv.v_ts + INTERVAL 1 HOUR
             |                  THEN 1 ELSE 0 END) AS converted
             |  FROM fv LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
             |    ON fv.user_id = p.user_id
             |  GROUP BY 1)
             |SELECT count(*) AS n_viewers, CAST(sum(converted) AS BIGINT) AS n_converted
             |FROM hits""".stripMargin)),

    // COHORT retention: users grouped by first-activity hour; per
    // (cohort, hour-offset) distinct active users. Two aggregations over
    // the user-hour grid — the classic retention triangle, still
    // map-side-combined and shuffle-bounded by distinct (user, hour).
    Q("cohort_retention",
      (s, dir) => {
        val e = TableIO.read(s, dir, "events")
          .select(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        val cohort = e.groupBy("user_id").agg(min("h").as("c_h"))
        e.join(cohort, "user_id")
          .withColumn("offset_h",
            ((unix_micros(col("h")) - unix_micros(col("c_h"))) / lit(3600000000L)).cast("long"))
          .groupBy(unix_micros(col("c_h")).as("cohort_us"), col("offset_h"))
          .agg(countDistinct("user_id").as("n_users"))
          .orderBy("cohort_us", "offset_h")
      },
      Some("""WITH c AS (
             |  SELECT user_id, min(date_trunc('hour', ts)) AS c_h FROM events GROUP BY 1)
             |SELECT epoch_us(c.c_h) AS cohort_us,
             |       CAST(epoch_us(date_trunc('hour', e.ts)) - epoch_us(c.c_h) AS BIGINT) // 3600000000 AS offset_h,
             |       count(DISTINCT e.user_id) AS n_users
             |FROM events e JOIN c ON e.user_id = c.user_id
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
              |ORDER BY user_id, session_start_us""".stripMargin)),

    // Batch gap-sessionization via lag + running sum (the join-free,
    // state-free form of session_window): per-session rollup keyed on the
    // explicit session_seq the operator assigns. Tie-broken on event_id
    // so equal-timestamp order is deterministic in both engines.
    Q("sessionize_gaps",
      (s, dir) => StreamingOps.sessionizeByGap(
          TableIO.read(s, dir, "events"), "user_id", "ts", "event_id", "30 minutes")
        .groupBy("user_id", "session_seq")
        .agg(
          count(lit(1)).as("n_events"),
          unix_micros(min(col("ts"))).as("start_us"),
          unix_micros(max(col("ts"))).as("end_us"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("v"))
        .orderBy("user_id", "session_seq"),
      Some(s"""WITH o AS (
              |  SELECT user_id, event_id, ts, value,
              |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
              |  FROM events),
              |g AS (
              |  SELECT *, SUM(CASE WHEN prev IS NULL OR ts >= prev + INTERVAL '30 minutes'
              |                     THEN 1 ELSE 0 END)
              |            OVER (PARTITION BY user_id ORDER BY ts, event_id
              |                  ROWS UNBOUNDED PRECEDING) AS session_seq
              |  FROM o)
              |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
              |  count(*) AS n_events,
              |  epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
              |  $DecimalSumSql AS v
              |FROM g
              |GROUP BY user_id, session_seq
              |ORDER BY user_id, session_seq""".stripMargin)),

    // RANGE-frame rolling window: per event, count + DECIMAL value sum of
    // the same user's events in the trailing hour — the time-based frame
    // (rangeBetween over µs) the rows-based running windows can't express.
    // RANGE includes ORDER-BY peers in both engines, so equal-timestamp
    // ties agree; output order is pinned by (user, ts, event_id).
    Q("rolling_time_sum",
      (s, dir) => {
        val e = TableIO.read(s, dir, "events")
          .withColumn("ts_us", unix_micros(col("ts")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts_us")
          .rangeBetween(-3600000000L, 0L)
        e.select(col("user_id"), col("event_id"), col("ts_us"),
            count(lit(1)).over(w).as("n_1h"),
            sum(col("value").cast("decimal(18,6)")).over(w).cast("double").as("v_1h"))
          .orderBy("user_id", "ts_us", "event_id")
      },
      Some("""SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             |  count(*) OVER w AS n_1h,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS v_1h
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, ts_us, event_id""".stripMargin)),

    // Stream-stream INTERVAL join, batch face (the impression→click
    // attribution shape): clicks within 1 hour AFTER each view, per user.
    // The identical lineage runs as a dual-watermark streaming join
    // (StreamingSpec proves batch/stream parity); registered here so the
    // join semantics are oracle-pinned too.
    Q("interval_join_agg",
      (s, dir) => {
        val e = TableIO.read(s, dir, "events")
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts").as("v_ts"), col("event_id").as("view_id"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("c_ts"))
        StreamingOps.intervalJoin(views, clicks, "user_id", "v_ts", "c_ts",
            horizon = "1 hour", watermark = "2 hours")
          .groupBy(col("l.user_id").as("user_id"), col("view_id"))
          .agg(count(lit(1)).as("n_clicks"))
          .orderBy("user_id", "view_id")
      },
      Some("""SELECT v.user_id AS user_id, v.event_id AS view_id, count(*) AS n_clicks
             |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') v
             |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
             |  ON v.user_id = c.user_id
             | AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
             |GROUP BY 1, 2
             |ORDER BY v.user_id, view_id""".stripMargin)),

    // SCD-2 dimension build from the event change log: per user, each
    // event_type change opens a validity interval closed by the next
    // change (null = current). One key shuffle; lag-filter, version
    // row_number and valid-to lead all reuse it (graft.ops.Scd).
    Q("scd2_dim",
      (s, dir) => graft.ops.Scd.scd2FromChangeLog(
          TableIO.read(s, dir, "events"), "user_id", "ts", "event_id", "event_type")
        .orderBy("user_id", "version"),
      Some("""WITH o AS (
             |  SELECT user_id, event_id, ts, event_type,
             |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
             |  FROM events),
             |ch AS (
             |  SELECT user_id, event_id, ts, event_type
             |  FROM o WHERE rn = 1 OR prev_state IS DISTINCT FROM event_type)
             |SELECT user_id, event_type AS state,
             |  CAST(row_number() OVER w AS INTEGER) AS version,
             |  epoch_us(ts) AS valid_from_us,
             |  lead(epoch_us(ts)) OVER w AS valid_to_us,
             |  lead(epoch_us(ts)) OVER w IS NULL AS is_current
             |FROM ch
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY user_id, version""".stripMargin)),

    // §2.10 × X6: distinct users per tumbling window — the streaming-
    // dashboard shape (unique visitors per hour). Exact count beside the
    // HLL sketch with the approx_distinct band discipline: DuckDB
    // recomputes the exact count and asserts the band LITERALLY, so the
    // hash compare proves both engines agree on the exact counts AND
    // that the sketch sat inside its guarantee. Identical lineage runs
    // incrementally under readStream (same window + approx aggregate).
    // rsd is 0.02 here, NOT approx_distinct's 0.01, and the difference
    // is the scale lesson: the HLL buffer (~m/6 longs) allocates PER
    // GROUP PER PARTITION, so at 720 windows × 32 partitions rsd 0.01
    // costs ~500 MB of aggregation buffers (measured: 3.2 s; 0.02 mixed
    // with count_distinct = 1.2 s — BenchAB probe_wau). 0.02 is the
    // measured floor that still holds the ±max(2%, 5-row) band at every
    // scale factor (0.05's σ ≈ 7 at the sf0.1 per-window cardinality of
    // ~140 broke one window's band). The shape is the approx_distinct
    // restructure applied to windows: distinct (window, user) FIRST,
    // then count(*) = the exact distinct and the sketch runs over the
    // already-distinct, AQE-coalesced exchange output — measured 0.44 s
    // vs 1.24 s for the mixed count_distinct + HLL aggregate. Many-group
    // sketching wants the lowest register count the band tolerates AND
    // the smallest input the set-semantics allow.
    Q("window_approx_users",
      (s, dir) => TableIO.read(s, dir, "events")
        .select(col("ts"), col("user_id")).filter(col("user_id").isNotNull)
        .select(window(col("ts"), "1 hour").as("w"), col("user_id")).distinct()
        .groupBy("w")
        .agg(
          count(lit(1)).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.02).as("__approx"))
        .select(unix_micros(col("w.start")).as("w_start_us"),
          col("exact_users"),
          // band = max(3·rsd, 5 rows): rsd is a 1-sigma figure, so a 2%
          // band at rsd 0.02 is ~1 sigma once exact_users·2% clears the
          // 5-row floor — it held only because fixture per-window
          // cardinalities (~140) keep HLL++ near-exact. 3 sigma (6%)
          // survives a driver fixture regen with larger windows.
          (abs(col("__approx") - col("exact_users"))
            <= greatest(col("exact_users") * lit(0.06), lit(5.0))).as("approx_in_band"))
        .orderBy("w_start_us"),
      Some("""SELECT epoch_us(date_trunc('hour', ts)) AS w_start_us,
             |  count(DISTINCT user_id) AS exact_users,
             |  TRUE AS approx_in_band
             |FROM events
             |WHERE user_id IS NOT NULL
             |GROUP BY 1
             |ORDER BY 1""".stripMargin))
  )
}
