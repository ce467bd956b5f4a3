package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * §2.10 — event-time windowing, batch-first.
 *
 * The reference is strictly batch (`/root/reference/entrypoint.sh:286`
 * exec's a finite spark-submit), so this whole surface is north-star
 * extension. Each operator is written against a plain DataFrame: applied
 * to a batch frame it is a windowed groupBy (DuckDB-verifiable); applied
 * to a `readStream` frame the identical lineage becomes an incremental
 * Structured Streaming query — that duality is the point of building on
 * `window`/`session_window` instead of hand-rolled state.
 *
 * Aggregates accumulate through DECIMAL so batch, streaming, and the
 * oracle agree bit-for-bit (SURVEY.md §7.5.5).
 */
object StreamingOps {

  private def decimalSum(c: String): Column =
    sum(col(c).cast("decimal(18,6)")).cast("double").as("v")

  /** Tumbling event-time window (e.g. hourly): one aggregation, shuffle
   * keyed on (window, key) — AQE-coalesced at scale. */
  def tumbling(df: DataFrame, tsCol: String, duration: String, key: String): DataFrame =
    df.groupBy(window(col(tsCol), duration).as("w"), col(key))
      .agg(count(lit(1)).as("n"), decimalSum("value"))
      .select(unix_micros(col("w.start")).as("w_start_us"), col(key), col("n"), col("v"))

  /** Sliding window: each event lands in duration/slide windows (the
   * built-in `window` generator expands them before aggregation). */
  def sliding(df: DataFrame, tsCol: String, duration: String, slide: String, key: String): DataFrame =
    df.groupBy(window(col(tsCol), duration, slide).as("w"), col(key))
      .agg(count(lit(1)).as("n"), decimalSum("value"))
      .select(unix_micros(col("w.start")).as("w_start_us"), col(key), col("n"), col("v"))

  /** Session window: sessions close after `gap` of event-time silence;
   * window end = last event + gap (Spark `session_window` semantics). */
  def sessionized(df: DataFrame, tsCol: String, gap: String, key: String): DataFrame =
    df.groupBy(session_window(col(tsCol), gap).as("w"), col(key))
      .agg(count(lit(1)).as("n"), decimalSum("value"))
      .select(
        col(key),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n"), col("v"))

  /** Streaming form: watermarked tumbling counts, ready for
   * `events.readStream` → `writeStream` (tested via MemoryStream). */
  def streamingTumbling(stream: DataFrame, tsCol: String, duration: String,
                        key: String, watermark: String): DataFrame =
    tumbling(stream.withWatermark(tsCol, watermark), tsCol, duration, key)

  /**
   * Batch gap-based sessionization — the lag/cumulative-sum face of
   * `session_window`: a new session starts when the gap to the previous
   * event of the same key reaches `gap` (break condition `>=`, mirroring
   * Spark's session_window semantics, see the session_window oracle).
   * Adds a per-key `session_seq` column (1-based).
   *
   * One shuffle on the key; both windows share its partitioning (lag and
   * the running sum reuse the same sort). `tieCol` breaks equal-timestamp
   * order deterministically — without it, lag over ties is
   * partition-order dependent. At 100 TB the key shuffle is the same one
   * any per-user analysis pays; no state store, no driver involvement.
   */
  def sessionizeByGap(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gap: String): DataFrame = {
    graft.ops.SqlTypes.requireFreeColumns(df, Seq("__prev_ts", "__boundary", "session_seq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    df.withColumn("__prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("__boundary",
        when(col("__prev_ts").isNull ||
          col(tsCol) >= col("__prev_ts") + expr(s"INTERVAL $gap"), 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("__boundary")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .drop("__prev_ts", "__boundary")
  }

  /** Streaming dedup within the watermark horizon — the streaming face of
   * X1 exact dedup (state store bounded by the watermark). */
  def streamingDedup(stream: DataFrame, tsCol: String, watermark: String, idCols: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /**
   * Stream-stream INTERVAL join (the impression→click attribution shape):
   * right events match left events with the same key when the right
   * timestamp falls in [left ts, left ts + horizon]. Both sides carry
   * watermarks and the join condition bounds both timestamps, so Spark
   * derives a state-eviction watermark for EACH side — without the time
   * bound, stream-stream join state grows forever. Applied to batch
   * frames, the identical lineage is a bucketless range join.
   *
   * The two inputs are aliased `l`/`r`, so they may share column names;
   * the caller projects from the returned `l.*`/`r.*` namespace.
   */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, horizon: String, watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    // identifiers are backtick-quoted so column names containing dots,
    // spaces, or reserved words parse as single identifiers
    l.join(r, expr(
      s"""l.`$key` = r.`$key`
         |AND r.`$rightTs` >= l.`$leftTs`
         |AND r.`$rightTs` <= l.`$leftTs` + interval $horizon""".stripMargin))
  }

  /** Input/output rows for the custom-state sessionizer. */
  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserRunningStats(user_id: Long, n_events: Long, total_value: Double, last_ts: java.sql.Timestamp)
  final case class SessionAgg(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /**
   * Custom-state sessionization with EVENT-TIME TIMEOUT — the state-
   * EVICTION face of §2.10 that `session_window` hides and
   * [[runningUserStats]] (NoTimeout) doesn't exercise: an open session
   * lives in the state store only until the watermark passes its end +
   * gap; then `hasTimedOut` fires, the FINAL session row is emitted, and
   * the state is removed. Without a timeout, one state entry per
   * ever-seen key lives forever — the unbounded-state leak that kills
   * long-running streaming jobs. Sessions closed by a gap WITHIN a batch
   * emit immediately; the tail session of each key emits on timeout.
   *
   * Batch iterators arrive unordered, so events are sorted by ts before
   * folding (per key per batch — bounded by the batch, not the stream).
   */
  def sessionizeWithState(events: org.apache.spark.sql.Dataset[UserEvent],
      gapMinutes: Int, watermarkDelay: String)
      : org.apache.spark.sql.Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapMicros = gapMinutes.toLong * 60L * 1000000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[SessionAgg]) => {
          if (state.hasTimedOut) {
            // watermark passed end + gap: the open session is final
            val done = state.get
            state.remove()
            Iterator.single(done)
          } else {
            val evs = batch.toSeq.sortBy(e => tsToUs(e.ts))
            var open = state.getOption
            val closed = Seq.newBuilder[SessionAgg]
            evs.foreach { e =>
              val us = tsToUs(e.ts)
              open = open match {
                case Some(s) if us - s.end_us < gapMicros =>
                  Some(s.copy(end_us = math.max(s.end_us, us), n_events = s.n_events + 1))
                case Some(s) => // gap reached within the batch: close it
                  closed += s
                  Some(SessionAgg(userId, us, us, 1L))
                case None => Some(SessionAgg(userId, us, us, 1L))
              }
            }
            open.foreach { s =>
              state.update(s)
              // evict when the watermark passes the session's horizon
              state.setTimeoutTimestamp(s.end_us / 1000L + gapMinutes.toLong * 60L * 1000L)
            }
            closed.result().iterator
          }
        })
  }

  /** Exact µs conversions for the custom-state operators.
   * `Timestamp.getTime * 1000` TRUNCATES sub-millisecond precision
   * (java.sql.Timestamp carries µs in its nanos field) — two events
   * 300 µs apart would collapse to the same instant and could swap
   * their order against the batch operators, which compare native µs
   * TimestampType. These helpers round-trip the full precision. */
  private[ext] def tsToUs(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
  private[ext] def usToTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Input/output rows for the streaming as-of join. `side` tags the
   * union: 0 = right (reference) stream, 1 = left (probe) stream. */
  final case class AsofEvent(key: Long, ts: java.sql.Timestamp, side: Int)
  final case class AsofMatch(key: Long, ts: java.sql.Timestamp, asof_ts: Option[java.sql.Timestamp])
  /** Per-key state: events not yet finalized by the watermark (µs, side)
   * and the greatest finalized right timestamp so far. */
  final case class AsofBuffer(pendingUs: Seq[(Long, Int)], lastRightUs: Option[Long])

  /**
   * Streaming backward as-of join — the incremental face of
   * [[TemporalJoins.asofBackward]]: for every left event, the greatest
   * right `ts` <= its `ts` within the key, over two unbounded streams.
   *
   * The batch form is a union-tag window over unbounded-preceding rows —
   * inexpressible as an incremental window aggregate, so this is the
   * `flatMapGroupsWithState` slot. Per key the state holds (a) events the
   * watermark has not yet finalized — disorder inside the delay cannot
   * change their relative order once the watermark passes them — and
   * (b) ONE µs long: the greatest finalized right timestamp. Each batch
   * (or event-time timeout, so progress needs no new data on the key)
   * finalizes pending events at or below the watermark in (ts, side)
   * order — right before left at equal ts, the batch form's inclusive
   * tie rule — emitting matched left rows and folding rights into the
   * scalar. State is O(events inside the watermark delay) per key while
   * active and exactly one scalar at rest: the buffer drains on the
   * watermark, it does not accumulate the stream.
   */
  def streamingAsofBackward(events: org.apache.spark.sql.Dataset[AsofEvent],
      watermarkDelay: String): org.apache.spark.sql.Dataset[AsofMatch] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, batch: Iterator[AsofEvent], state: GroupState[AsofBuffer]) => {
          val st = state.getOption.getOrElse(AsofBuffer(Nil, None))
          val pending = st.pendingUs ++
            batch.map(e => (tsToUs(e.ts), e.side))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, rest) = pending.partition(_._1 <= wmUs)
          var lastRight = st.lastRightUs
          val out = Seq.newBuilder[AsofMatch]
          ready.sorted.foreach { case (us, side) =>
            if (side == 0) lastRight = Some(lastRight.fold(us)(math.max(_, us)))
            else out += AsofMatch(key, usToTs(us), lastRight.map(usToTs))
          }
          state.update(AsofBuffer(rest, lastRight))
          // wake on watermark progress past the oldest pending event —
          // rest is strictly above the current watermark, so the target
          // is legal (must be > watermark). A key with an empty buffer
          // rests at one scalar and needs no timeout.
          if (rest.nonEmpty) state.setTimeoutTimestamp(rest.map(_._1).min / 1000L + 1L)
          out.result().iterator
        })
  }

  /** Per-key state for the FORWARD streaming as-of: watermark-pending
   * events plus finalized left rows still waiting for a future right. */
  final case class AsofFwdBuffer(pendingUs: Seq[(Long, Int)], waitingLeftUs: Seq[Long])

  /** Rows for the streaming SCD-2 maintainer. */
  final case class ScdChange(key: Long, ts: java.sql.Timestamp, tie: Long, state: Option[String])
  final case class ScdClosed(key: Long, state: Option[String], version: Int,
      valid_from_us: Long, valid_to_us: Long)
  /** Per-key state: watermark-pending changes plus the one open interval. */
  final case class ScdBuffer(pending: Seq[(Long, Long, Option[String])],
      hasOpen: Boolean, openState: Option[String], openFromUs: Long, openVersion: Int)

  /**
   * Streaming SCD-2 dimension maintenance — the incremental face of
   * [[graft.ops.Scd.scd2FromChangeLog]]: fold a change stream into
   * validity intervals as it arrives, instead of re-windowing the full
   * log per batch.
   *
   * Append-mode discipline: only CLOSED intervals emit (valid_from/to
   * both known and final); the single open interval per key lives in the
   * state store — one row regardless of stream length, the same at-rest
   * footprint as the backward as-of scalar. Events finalize in
   * (ts, tie) order once the watermark passes them, so out-of-order
   * arrival inside the delay cannot reorder history; consecutive
   * duplicates of the same state collapse exactly like the batch
   * operator (None is a real state and compares as itself, the
   * null-safe `<=>` contract).
   */
  def streamingScd2(changes: org.apache.spark.sql.Dataset[ScdChange],
      watermarkDelay: String): org.apache.spark.sql.Dataset[ScdClosed] = {
    import changes.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    changes.withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, batch: Iterator[ScdChange], state: GroupState[ScdBuffer]) => {
          val st = state.getOption.getOrElse(ScdBuffer(Nil, hasOpen = false, None, 0L, 0))
          val pending = st.pending ++
            batch.map(c => (tsToUs(c.ts), c.tie, c.state))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, rest) = pending.partition(_._1 <= wmUs)
          var (hasOpen, openState, openFrom, openVer) =
            (st.hasOpen, st.openState, st.openFromUs, st.openVersion)
          val out = Seq.newBuilder[ScdClosed]
          ready.sortBy { case (us, tie, _) => (us, tie) }.foreach { case (us, _, s) =>
            if (!hasOpen) { hasOpen = true; openState = s; openFrom = us; openVer = 1 }
            else if (openState != s) { // Option equality == null-safe <=>
              out += ScdClosed(key, openState, openVer, openFrom, us)
              openState = s; openFrom = us; openVer += 1
            } // same state: collapse into the open interval
          }
          state.update(ScdBuffer(rest, hasOpen, openState, openFrom, openVer))
          if (rest.nonEmpty)
            state.setTimeoutTimestamp(rest.map(_._1).min / 1000L + 1L)
          out.result().iterator
        })
  }

  /**
   * Streaming forward as-of join — the incremental face of
   * [[TemporalJoins.asofForward]]: for every left event, the EARLIEST
   * right `ts` >= its `ts` within the key.
   *
   * The forward direction has a state problem the backward one doesn't:
   * a left row's match lies in the FUTURE, so an unmatched left would
   * wait in state forever on a key whose right stream went quiet. The
   * `horizonMinutes` bound fixes that — a left with no right inside
   * `[ts, ts + horizon]` emits with `asof_ts = None` once the watermark
   * proves no such right can arrive, exactly the bounded-wait contract a
   * stream-stream interval join imposes for the same reason. State is
   * therefore O(delay) pending + O(horizon) waiting lefts per key, never
   * the stream.
   *
   * Tie and match discipline mirror the batch operator: a right at the
   * left's own timestamp matches (inclusive), and because finalized
   * events process in timestamp order, the first right processed after a
   * left IS its earliest future right — every waiting left matches the
   * next finalized right and drains.
   */
  def streamingAsofForward(events: org.apache.spark.sql.Dataset[AsofEvent],
      watermarkDelay: String, horizonMinutes: Int): org.apache.spark.sql.Dataset[AsofMatch] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val horizonUs = horizonMinutes.toLong * 60L * 1000000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, batch: Iterator[AsofEvent], state: GroupState[AsofFwdBuffer]) => {
          val st = state.getOption.getOrElse(AsofFwdBuffer(Nil, Nil))
          val pending = st.pendingUs ++
            batch.map(e => (tsToUs(e.ts), e.side))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, rest) = pending.partition(_._1 <= wmUs)
          var waiting = st.waitingLeftUs
          val out = Seq.newBuilder[AsofMatch]
          // left BEFORE right at equal ts, so an equal-ts right sees the
          // left already waiting and matches it (inclusive semantics)
          ready.sortBy { case (us, side) => (us, -side) }.foreach { case (us, side) =>
            if (side == 1) waiting = waiting :+ us
            else {
              // the horizon binds HERE too, not only at watermark expiry:
              // when a quiet key's first right finalizes in the same pass
              // that drains old lefts, a left whose deadline passed before
              // this right must still report no-match — otherwise the
              // result would depend on watermark cadence (a slow watermark
              // would emit a match the contract forbids)
              val (lapsed, inReach) = waiting.partition(_ + horizonUs < us)
              lapsed.foreach(l => out += AsofMatch(key, usToTs(l), None))
              inReach.foreach(l => out += AsofMatch(key, usToTs(l), Some(usToTs(us))))
              waiting = Nil
            }
          }
          // horizon expiry: the watermark proves no right can arrive at
          // or before waiting-left + horizon anymore -> no-match is final
          val (expired, stillWaiting) = waiting.partition(_ + horizonUs <= wmUs)
          expired.foreach(l => out += AsofMatch(key, usToTs(l), None))
          state.update(AsofFwdBuffer(rest, stillWaiting))
          // wake at whichever boundary comes first: the oldest pending
          // event finalizing, or the oldest waiting left expiring. Both
          // targets are strictly above the current watermark: floor-to-ms
          // then +1 (mirroring the backward operator), because a raw
          // (l + horizonUs) / 1000 can floor to exactly the watermark
          // millisecond — Spark happens to accept a target equal to the
          // watermark today, but the contract here is strictly-after.
          val wake = (rest.map(_._1 / 1000L + 1L) ++
            stillWaiting.map(l => (l + horizonUs) / 1000L + 1L)).minOption
          wake.foreach(state.setTimeoutTimestamp)
          out.result().iterator
        })
  }

  /**
   * Custom keyed state beyond what `session_window` expresses — the
   * `flatMapGroupsWithState` face of §2.10: a per-user running aggregate
   * emitted on every micro-batch. State lives in the state store (scales
   * with distinct keys, not events) and is the pattern slot for custom
   * session logic the built-in windows can't express.
   */
  def runningUserStats(events: org.apache.spark.sql.Dataset[UserEvent])
      : org.apache.spark.sql.Dataset[UserRunningStats] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[UserRunningStats]) => {
          val evs = batch.toSeq
          if (evs.isEmpty) Iterator.empty
          else {
            val prev = state.getOption.getOrElse(UserRunningStats(userId, 0L, 0.0, evs.head.ts))
            val batchMax = evs.maxBy(e => tsToUs(e.ts)).ts
            // DECIMAL-discipline (file header contract): exact BigDecimal
            // accumulation makes the per-batch sum independent of event
            // order WITHIN a batch (a raw Double fold varies in the low
            // bits with iteration order); only the stored running total
            // rounds to Double at batch boundaries
            val total = (BigDecimal(prev.total_value) +
              evs.map(e => BigDecimal(e.value)).sum).toDouble
            val next = UserRunningStats(
              userId,
              prev.n_events + evs.size,
              total,
              // late data must not move last_ts backwards: a micro-batch
              // holding only an out-of-order event would otherwise
              // overwrite the newer watermark the state already carries
              if (state.exists && prev.last_ts.after(batchMax)) prev.last_ts else batchMax)
            state.update(next)
            Iterator.single(next)
          }
        })
  }

  /** Input/output/state rows for the streaming group top-k. */
  final case class ScoredEvent(key: Long, ts: java.sql.Timestamp, item: Long, score: Long)
  final case class TopKWindowState(windows: Map[Long, Seq[(Long, Long)]])
  final case class TopKRow(key: Long, window_start_us: Long, rank: Int, item: Long, score: Long)

  /**
   * STREAMING face of the native GroupTopK operator (plans/GroupTopK):
   * per (key, tumbling window) emit the top-k items by (score desc, item
   * asc) exactly once, when the watermark proves the window complete —
   * the leaderboard/heavy-contributor shape.
   *
   * State economics mirror the batch operator's partial exec: the state
   * store holds at most k (item, score) pairs PER OPEN WINDOW per key —
   * never the event stream — so state is bounded by k x open-windows x
   * keys regardless of event volume, and each merge is the same bounded
   * insert the batch heaps do. Windows emit in Append mode on watermark
   * passage (or event-time timeout for keys with no further events — the
   * wake target is floor-to-ms + 1, strictly above the watermark, the
   * same contract as the as-of operators). Late events older than the
   * watermark are dropped by the operator, standard streaming semantics.
   */
  def streamingGroupTopK(events: org.apache.spark.sql.Dataset[ScoredEvent],
      windowUs: Long, k: Int, watermarkDelay: String)
      : org.apache.spark.sql.Dataset[TopKRow] = {
    require(windowUs > 0 && k >= 1, s"need windowUs > 0 and k >= 1, got $windowUs, $k")
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, batch: Iterator[ScoredEvent], state: GroupState[TopKWindowState]) => {
          var windows = state.getOption.map(_.windows).getOrElse(Map.empty)
          batch.foreach { e =>
            val us = tsToUs(e.ts)
            val w = us - us % windowUs
            val merged = ((e.item, e.score) +: windows.getOrElse(w, Nil))
              .sortBy { case (item, score) => (-score, item) }
              .take(k)
            windows = windows.updated(w, merged)
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // a window is final when the watermark passes its END
          val (done, open) = windows.partition { case (w, _) => w + windowUs <= wmUs }
          val out = done.toSeq.sortBy(_._1).flatMap { case (w, top) =>
            top.zipWithIndex.map { case ((item, score), i) =>
              TopKRow(key, w, i + 1, item, score) }
          }
          if (open.isEmpty) state.remove()
          else {
            state.update(TopKWindowState(open))
            // wake when the earliest open window can finalize; strictly
            // above the current watermark (floor-to-ms + 1)
            state.setTimeoutTimestamp(
              math.max(open.keys.min + windowUs, wmUs) / 1000L + 1L)
          }
          out.iterator
        })
  }
}
