package graft.ext

import graft.SparkSpec
import graft.io.TableIO
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Top-level so Spark can instantiate the encoder without an outer scope. */
case class Ev(ts: Timestamp, event_type: String, value: Double)

/** The batch-registered window queries re-run as real Structured
 * Streaming: identical lineage over a MemoryStream must produce the same
 * aggregates as the batch path (§2.10 duality). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming tumbling window matches the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val events = TableIO.read(spark, Sf, "events")
      .select($"ts", $"event_type", $"value").as[Ev].collect().toSeq

    val stream = MemoryStream[Ev]
    stream.addData(events)
    val q = StreamingOps.streamingTumbling(stream.toDF(), "ts", "1 hour", "event_type", "2 hours")
      .writeStream.outputMode("complete").format("memory").queryName("tumbling_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val streamed = spark.table("tumbling_out")
      .select("w_start_us", "event_type", "n", "v")
      .orderBy("w_start_us", "event_type")
      .as[(Long, String, Long, Double)].collect().toSeq
    val batch = StreamingOps.tumbling(TableIO.read(spark, Sf, "events"), "ts", "1 hour", "event_type")
      .orderBy("w_start_us", "event_type")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(streamed == batch)
  }

  test("windowed approx-distinct lineage runs incrementally and matches its batch sketch") {
    // the window_approx_users claim: the identical window + HLL aggregate
    // lineage is streaming-runnable (HLL partials merge across batches)
    // and converges to the batch sketch values on the same data
    implicit val sqlCtx = spark.sqlContext
    case class UEv(ts: Timestamp, user_id: Long)
    val rows = TableIO.read(spark, Sf, "events")
      .select($"ts", $"user_id").filter($"user_id".isNotNull)
      .as[(Timestamp, Long)].collect().toSeq
    val stream = MemoryStream[(Timestamp, Long)]
    // two batches so HLL partials genuinely merge across micro-batches
    val (b1, b2) = rows.splitAt(rows.size / 2)
    stream.addData(b1)
    def lineage(df: org.apache.spark.sql.DataFrame) = df.toDF("ts", "user_id")
      .groupBy(window($"ts", "1 hour").as("w"))
      .agg(approx_count_distinct($"user_id", 0.01).as("approx_users"))
      .select(unix_micros($"w.start").as("w_start_us"), $"approx_users")
    val q = lineage(stream.toDF()).writeStream
      .outputMode("complete").format("memory").queryName("wau_out").start()
    try {
      q.processAllAvailable()
      stream.addData(b2)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("wau_out").orderBy("w_start_us")
      .as[(Long, Long)].collect().toSeq
    val batch = lineage(rows.toDF("ts", "user_id")).orderBy("w_start_us")
      .as[(Long, Long)].collect().toSeq
    assert(streamed == batch, "streaming HLL sketch diverged from the batch sketch")
  }

  test("streaming dedup drops duplicate ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp)]
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    stream.addData(Seq((1L, t0), (2L, t0), (1L, t0), (3L, t0), (2L, t0)))
    val deduped = StreamingOps.streamingDedup(
      stream.toDF().toDF("id", "ts"), "ts", "1 hour", Seq("id"))
    val q = deduped.writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try { q.processAllAvailable() } finally q.stop()
    assert(spark.table("dedup_out").select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("flatMapGroupsWithState running stats accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamingOps.UserEvent]
    val q = StreamingOps.runningUserStats(stream.toDS())
      .writeStream.outputMode("append").format("memory").queryName("running_out").start()
    try {
      stream.addData(StreamingOps.UserEvent(1L, Timestamp.valueOf("2024-01-01 00:00:00"), 10.0))
      q.processAllAvailable()
      stream.addData(
        StreamingOps.UserEvent(1L, Timestamp.valueOf("2024-01-01 00:05:00"), 5.0),
        StreamingOps.UserEvent(2L, Timestamp.valueOf("2024-01-01 00:06:00"), 7.0))
      q.processAllAvailable()
    } finally q.stop()
    val byBatch = spark.table("running_out")
      .select("user_id", "n_events", "total_value")
      .as[(Long, Long, Double)].collect().toSet
    // user 1: first batch (1, 10.0), second batch accumulated (2, 15.0); user 2: (1, 7.0)
    assert(byBatch == Set((1L, 1L, 10.0), (1L, 2L, 15.0), (2L, 1L, 7.0)))
  }

  test("file sink + checkpoint resumes exactly-once across query restarts") {
    implicit val sqlCtx = spark.sqlContext
    val out = tmpDir() + "/sink"
    val ckpt = tmpDir() + "/ckpt"
    val stream = MemoryStream[(Long, Double)]

    def start() = stream.toDF().toDF("id", "v")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    // first incarnation processes batch 1
    val q1 = start()
    stream.addData((1L, 1.0), (2L, 2.0))
    q1.processAllAvailable(); q1.stop()
    // second incarnation resumes from the checkpoint: batch 1 must not
    // be re-emitted, batch 2 must land
    stream.addData((3L, 3.0))
    val q2 = start()
    stream.addData((4L, 4.0))
    q2.processAllAvailable(); q2.stop()

    val ids = spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L), s"got $ids")
  }

  test("streaming SCD-2 state survives a checkpointed restart") {
    // the custom-state buffers (Seq/Option case classes) must round-trip
    // the state store: a restart between the opening change and the
    // closing change only produces the correct closed interval if the
    // open-interval state was durably recovered
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val out = tmpDir() + "/scd_sink"
    val ckpt = tmpDir() + "/scd_ckpt"
    val source = MemoryStream[StreamingOps.ScdChange]
    def start() = StreamingOps.streamingScd2(source.toDS(), watermarkDelay = "10 minutes")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    // incarnation 1: open interval A at 10:00 (finalized once the
    // watermark passes it), then stop
    val q1 = start()
    source.addData(
      StreamingOps.ScdChange(1L, ts("2024-01-01 10:00:00"), 1L, Some("A")),
      StreamingOps.ScdChange(99L, ts("2024-01-01 10:30:00"), 2L, Some("X")))
    q1.processAllAvailable(); q1.stop()
    // incarnation 2: the closing change arrives after restart — interval
    // A can only close correctly if its open state was recovered
    val q2 = start()
    source.addData(
      StreamingOps.ScdChange(1L, ts("2024-01-01 10:40:00"), 3L, Some("B")),
      StreamingOps.ScdChange(99L, ts("2024-01-01 11:30:00"), 4L, Some("X")))
    q2.processAllAvailable()
    source.addData(StreamingOps.ScdChange(99L, ts("2024-01-01 12:00:00"), 5L, Some("X")))
    q2.processAllAvailable(); q2.stop()

    val closed = spark.read.parquet(out).as[StreamingOps.ScdClosed].collect()
      .filter(_.key == 1L)
      .map(c => (c.state, c.version, c.valid_from_us, c.valid_to_us)).toSet
    def us(s: String) = ts(s).getTime * 1000L
    assert(closed == Set[(Option[String], Int, Long, Long)](
      (Some("A"), 1, us("2024-01-01 10:00:00"), us("2024-01-01 10:40:00"))),
      s"state did not survive the restart: $closed")
  }

  test("stream-stream interval join matches within the horizon only") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    imps.addData(Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, Timestamp.valueOf("2024-01-01 00:00:00"))))
    clicks.addData(Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:05:00")), // in horizon
      (1L, Timestamp.valueOf("2024-01-01 02:00:00")), // past horizon
      (2L, Timestamp.valueOf("2023-12-31 23:00:00")), // before impression
      (3L, Timestamp.valueOf("2024-01-01 00:01:00")))) // no impression
    val joined = StreamingOps.intervalJoin(
      imps.toDF().toDF("user_id", "imp_ts"), clicks.toDF().toDF("user_id", "click_ts"),
      "user_id", "imp_ts", "click_ts", horizon = "1 hour", watermark = "2 hours")
      .select(col("l.user_id"), col("click_ts"))
    val q = joined.writeStream.outputMode("append").format("memory").queryName("ssj_out").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("ssj_out").as[(Long, Timestamp)].collect().toSeq
    assert(got == Seq((1L, Timestamp.valueOf("2024-01-01 00:05:00"))), s"got $got")

    // batch duality: the identical lineage over batch frames agrees
    val bImps = Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, Timestamp.valueOf("2024-01-01 00:00:00"))).toDF("user_id", "imp_ts")
    val bClicks = Seq((1L, Timestamp.valueOf("2024-01-01 00:05:00")),
      (1L, Timestamp.valueOf("2024-01-01 02:00:00")),
      (2L, Timestamp.valueOf("2023-12-31 23:00:00")),
      (3L, Timestamp.valueOf("2024-01-01 00:01:00"))).toDF("user_id", "click_ts")
    val batch = StreamingOps.intervalJoin(bImps, bClicks,
      "user_id", "imp_ts", "click_ts", horizon = "1 hour", watermark = "2 hours")
      .select(col("l.user_id"), col("click_ts"))
      .as[(Long, Timestamp)].collect().toSeq
    assert(batch == got)
  }

  test("intervalJoin handles reserved-word and dotted column names (backtick quoting)") {
    val left = Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("order", "event.ts") // reserved word + dotted name
    val right = Seq((1L, Timestamp.valueOf("2024-01-01 00:05:00")))
      .toDF("order", "click.ts")
    val out = StreamingOps.intervalJoin(left, right,
      "order", "event.ts", "click.ts", horizon = "1 hour", watermark = "2 hours")
    assert(out.count() == 1)
  }

  test("stateful sessionizer emits in-batch closed sessions and evicts on event-time timeout") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[StreamingOps.UserEvent]
    val out = StreamingOps.sessionizeWithState(source.toDS(), gapMinutes = 30, watermarkDelay = "10 minutes")
    val q = out.writeStream.outputMode("append").format("memory").queryName("sess_state").start()
    def ts(s: String) = Timestamp.valueOf(s)
    try {
      // batch 1: user 1 opens a session; a second event extends it; a
      // THIRD event past the gap closes the first WITHIN the batch
      source.addData(
        StreamingOps.UserEvent(1L, ts("2024-01-01 10:00:00"), 1.0),
        StreamingOps.UserEvent(1L, ts("2024-01-01 10:05:00"), 1.0),
        StreamingOps.UserEvent(1L, ts("2024-01-01 11:00:00"), 1.0))
      q.processAllAvailable()
      val afterB1 = spark.table("sess_state").as[StreamingOps.SessionAgg].collect().toSet
      assert(afterB1.map(s => (s.user_id, s.n_events)) == Set((1L, 2L)),
        s"in-batch closed session missing: $afterB1")

      // batch 2: another user far in the future advances the watermark
      // past user 1's open-session horizon -> timeout emits the final row
      // and evicts the state
      source.addData(StreamingOps.UserEvent(2L, ts("2024-01-01 14:00:00"), 1.0))
      q.processAllAvailable()
      // timeouts fire when a batch RUNS with the advanced watermark
      source.addData(StreamingOps.UserEvent(2L, ts("2024-01-01 14:01:00"), 1.0))
      q.processAllAvailable()
      val all = spark.table("sess_state").as[StreamingOps.SessionAgg].collect().toSet
      assert(all.exists(s => s.user_id == 1L && s.n_events == 1L &&
        s.start_us == ts("2024-01-01 11:00:00").getTime * 1000L),
        s"tail session not emitted on event-time timeout: $all")
    } finally q.stop()
  }

  test("streaming as-of join matches the batch asofBackward, including ties, late data, and no-match") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val source = MemoryStream[StreamingOps.AsofEvent]
    val out = StreamingOps.streamingAsofBackward(source.toDS(), watermarkDelay = "1 hour")
    val q = out.writeStream.outputMode("append").format("memory").queryName("asof_state").start()
    val R = 0; val L = 1
    try {
      // batch 1: rights and lefts for key 1, including an equal-ts tie
      // (left 10:00 must match right 10:00 — inclusive) and a left with
      // no preceding right (09:00 -> null)
      source.addData(
        StreamingOps.AsofEvent(1L, ts("2024-01-01 10:00:00"), R),
        StreamingOps.AsofEvent(1L, ts("2024-01-01 10:00:00"), L),
        StreamingOps.AsofEvent(1L, ts("2024-01-01 10:30:00"), R),
        StreamingOps.AsofEvent(1L, ts("2024-01-01 10:45:00"), L),
        StreamingOps.AsofEvent(1L, ts("2024-01-01 09:00:00"), L))
      q.processAllAvailable()
      // batch 2: an out-of-order left INSIDE the watermark delay arrives
      // after later events already did — must still match right 10:00,
      // not 10:30. A far key advances the watermark.
      source.addData(
        StreamingOps.AsofEvent(1L, ts("2024-01-01 10:15:00"), L),
        StreamingOps.AsofEvent(99L, ts("2024-01-01 13:00:00"), R))
      q.processAllAvailable()
      // batch 3: watermark (13:00 - 1h) passes every key-1 event; the
      // key-1 buffer drains via event-time timeout with no key-1 data
      source.addData(StreamingOps.AsofEvent(99L, ts("2024-01-01 14:00:00"), R))
      q.processAllAvailable()

      val got = spark.table("asof_state").as[StreamingOps.AsofMatch].collect()
        .filter(_.key == 1L).map(m => (m.ts, m.asof_ts)).toSet
      val expected = Set[(Timestamp, Option[Timestamp])](
        (ts("2024-01-01 09:00:00"), None),
        (ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 10:00:00"))),
        (ts("2024-01-01 10:15:00"), Some(ts("2024-01-01 10:00:00"))),
        (ts("2024-01-01 10:45:00"), Some(ts("2024-01-01 10:30:00"))))
      assert(got == expected, s"streaming asof emitted $got")

      // batch duality: the batch operator over the same key-1 frames
      val lefts = Seq(ts("2024-01-01 10:00:00"), ts("2024-01-01 10:45:00"),
        ts("2024-01-01 09:00:00"), ts("2024-01-01 10:15:00"))
        .map(t => (1L, t)).toDF("key", "ts")
      val rights = Seq(ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00"))
        .map(t => (1L, t)).toDF("key", "ts")
      val batch = TemporalJoins.asofBackward(lefts, rights, Seq("key"), "ts", "asof_ts")
        .select("ts", "asof_ts").as[(Timestamp, Option[Timestamp])].collect().toSet
      assert(batch == expected, s"batch asofBackward disagrees: $batch")
    } finally q.stop()
  }

  test("streaming as-of preserves sub-millisecond order (micros are not truncated)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // left at .000300, right at .000400 — the right is AFTER the left, so
    // backward as-of must yield no match; ms-truncated conversion would
    // collapse both to .000 and the (ts, side) sort would then put the
    // right first and fabricate a match
    def tsU(s: String, micros: Int) = {
      val t = Timestamp.valueOf(s); t.setNanos(micros * 1000); t
    }
    val source = MemoryStream[StreamingOps.AsofEvent]
    val out = StreamingOps.streamingAsofBackward(source.toDS(), watermarkDelay = "10 minutes")
    val q = out.writeStream.outputMode("append").format("memory").queryName("asof_us").start()
    try {
      source.addData(
        StreamingOps.AsofEvent(1L, tsU("2024-01-01 10:00:00", 300), 1),
        StreamingOps.AsofEvent(1L, tsU("2024-01-01 10:00:00", 400), 0))
      q.processAllAvailable()
      source.addData(StreamingOps.AsofEvent(99L, Timestamp.valueOf("2024-01-01 11:00:00"), 0))
      q.processAllAvailable()
      source.addData(StreamingOps.AsofEvent(99L, Timestamp.valueOf("2024-01-01 11:30:00"), 0))
      q.processAllAvailable()
      val got = spark.table("asof_us").as[StreamingOps.AsofMatch].collect()
        .filter(_.key == 1L).map(m => (m.ts, m.asof_ts)).toList
      assert(got == List((tsU("2024-01-01 10:00:00", 300), None)),
        s"sub-ms order violated: $got")
    } finally q.stop()
  }

  test("streaming forward as-of matches batch asofForward; lefts expire to no-match at the horizon") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val source = MemoryStream[StreamingOps.AsofEvent]
    val out = StreamingOps.streamingAsofForward(source.toDS(),
      watermarkDelay = "30 minutes", horizonMinutes = 60)
    val q = out.writeStream.outputMode("append").format("memory").queryName("asoff_state").start()
    val R = 0; val L = 1
    try {
      // key 1: left 10:00 ties a right at 10:00 (inclusive); left 10:05
      // waits for the NEXT right (10:30, arriving a batch later); left
      // 11:50 never sees a right inside its 60-minute horizon -> must
      // emit None once the watermark proves it. Batch boundaries keep
      // every arrival inside the 30-minute watermark delay — later than
      // that and the engine itself drops the row as late data.
      source.addData(
        StreamingOps.AsofEvent(1L, ts("2024-01-01 10:00:00"), L),
        StreamingOps.AsofEvent(1L, ts("2024-01-01 10:00:00"), R),
        StreamingOps.AsofEvent(1L, ts("2024-01-01 10:05:00"), L),
        // key 2: its only right is PAST the 60-min horizon and both rows
        // finalize in the same watermark pass — the horizon must bind in
        // the match loop, not only at watermark expiry, or the result
        // would depend on watermark cadence
        StreamingOps.AsofEvent(2L, ts("2024-01-01 10:00:00"), L))
      q.processAllAvailable()
      source.addData(
        StreamingOps.AsofEvent(1L, ts("2024-01-01 10:30:00"), R),
        StreamingOps.AsofEvent(1L, ts("2024-01-01 11:50:00"), L),
        StreamingOps.AsofEvent(2L, ts("2024-01-01 11:30:00"), R))
      q.processAllAvailable()
      // advance the watermark to 13:00 (> 11:50 + 60min horizon), then
      // once more so the key-1 event-time timeout actually runs
      source.addData(StreamingOps.AsofEvent(99L, ts("2024-01-01 13:30:00"), R))
      q.processAllAvailable()
      source.addData(StreamingOps.AsofEvent(99L, ts("2024-01-01 14:00:00"), R))
      q.processAllAvailable()

      val got = spark.table("asoff_state").as[StreamingOps.AsofMatch].collect()
        .filter(_.key == 1L).map(m => (m.ts, m.asof_ts)).toSet
      val expected = Set[(Timestamp, Option[Timestamp])](
        (ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 10:00:00"))),
        (ts("2024-01-01 10:05:00"), Some(ts("2024-01-01 10:30:00"))),
        (ts("2024-01-01 11:50:00"), None))
      assert(got == expected, s"streaming forward asof emitted $got")
      val gotK2 = spark.table("asoff_state").as[StreamingOps.AsofMatch].collect()
        .filter(_.key == 2L).map(m => (m.ts, m.asof_ts)).toSet
      assert(gotK2 == Set[(Timestamp, Option[Timestamp])]((ts("2024-01-01 10:00:00"), None)),
        s"a right past the horizon must not match even when it finalizes in the same pass: $gotK2")

      // batch duality on the same key-1 frames (no right ever follows
      // 11:50, so the unbounded batch operator also gives null there)
      val lefts = Seq(ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"),
        ts("2024-01-01 11:50:00")).map(t => (1L, t)).toDF("key", "ts")
      val rights = Seq(ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00"))
        .map(t => (1L, t)).toDF("key", "ts")
      val batch = TemporalJoins.asofForward(lefts, rights, Seq("key"), "ts", "asof_ts")
        .select("ts", "asof_ts").as[(Timestamp, Option[Timestamp])].collect().toSet
      assert(batch == expected, s"batch asofForward disagrees: $batch")
    } finally q.stop()
  }

  test("streaming SCD-2 emits closed intervals matching the batch build, collapsing duplicates and null states") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val source = MemoryStream[StreamingOps.ScdChange]
    val out = StreamingOps.streamingScd2(source.toDS(), watermarkDelay = "30 minutes")
    val q = out.writeStream.outputMode("append").format("memory").queryName("scd_state").start()
    try {
      // key 1 history: A at 10:00, duplicate A at 10:10 (collapses),
      // transition to null state at 10:20 (a REAL state), back to B at
      // 10:40 — with the 10:10 duplicate arriving out of order
      source.addData(
        StreamingOps.ScdChange(1L, ts("2024-01-01 10:00:00"), 1L, Some("A")),
        StreamingOps.ScdChange(1L, ts("2024-01-01 10:20:00"), 2L, None))
      q.processAllAvailable()
      source.addData(
        StreamingOps.ScdChange(1L, ts("2024-01-01 10:10:00"), 3L, Some("A")),
        StreamingOps.ScdChange(1L, ts("2024-01-01 10:40:00"), 4L, Some("B")))
      q.processAllAvailable()
      // advance the watermark past every key-1 change, then once more so
      // the event-time timeout drains the buffer
      source.addData(StreamingOps.ScdChange(99L, ts("2024-01-01 12:00:00"), 5L, Some("X")))
      q.processAllAvailable()
      source.addData(StreamingOps.ScdChange(99L, ts("2024-01-01 12:30:00"), 6L, Some("X")))
      q.processAllAvailable()

      val got = spark.table("scd_state").as[StreamingOps.ScdClosed].collect()
        .filter(_.key == 1L)
        .map(c => (c.state, c.version, c.valid_from_us, c.valid_to_us)).toSet
      def us(s: String) = ts(s).getTime * 1000L
      // closed intervals only: A [10:00, 10:20) v1, null [10:20, 10:40) v2;
      // B stays open in state and must NOT emit
      val expected = Set[(Option[String], Int, Long, Long)](
        (Some("A"), 1, us("2024-01-01 10:00:00"), us("2024-01-01 10:20:00")),
        (None, 2, us("2024-01-01 10:20:00"), us("2024-01-01 10:40:00")))
      assert(got == expected, s"streaming scd2 emitted $got")

      // batch duality: the batch operator over the same change rows,
      // restricted to its closed intervals, agrees
      val log = Seq(
        (1L, ts("2024-01-01 10:00:00"), 1L, "A"),
        (1L, ts("2024-01-01 10:20:00"), 2L, null.asInstanceOf[String]),
        (1L, ts("2024-01-01 10:10:00"), 3L, "A"),
        (1L, ts("2024-01-01 10:40:00"), 4L, "B")
      ).toDF("key", "ts", "tie", "state")
      val batch = graft.ops.Scd.scd2FromChangeLog(log, "key", "ts", "tie", "state")
        .filter(col("valid_to_us").isNotNull)
        .select("state", "version", "valid_from_us", "valid_to_us")
        .as[(Option[String], Int, Long, Long)].collect().toSet
      assert(batch == expected, s"batch scd2 closed intervals disagree: $batch")
    } finally q.stop()
  }

  test("sessionized assigns gap-separated events to distinct sessions") {
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      (1L, Timestamp.valueOf("2024-01-01 00:10:00"), 1.0),
      (1L, Timestamp.valueOf("2024-01-01 01:00:00"), 1.0), // 50 min gap -> new session
      (2L, Timestamp.valueOf("2024-01-01 00:05:00"), 1.0)
    ).toDF("user_id", "ts", "value")
    val out = StreamingOps.sessionized(df, "ts", "30 minutes", "user_id")
      .orderBy("user_id", "session_start_us")
      .select("user_id", "n").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("streaming group top-k matches a batch reference and emits each window once") {
    implicit val sqlCtx = spark.sqlContext
    import StreamingOps.{ScoredEvent, TopKRow}
    def ts(s: String) = Timestamp.valueOf(s)
    val winUs = 60L * 1000000L // 1-minute tumbling windows
    // two keys, three windows, out-of-order arrival, a score tie (items
    // 7 vs 9 at score 50 -> item asc wins), and more items than k
    val b1 = Seq(
      ScoredEvent(1L, ts("2024-01-01 00:00:05"), 7L, 50L),
      ScoredEvent(1L, ts("2024-01-01 00:00:40"), 9L, 50L),
      ScoredEvent(1L, ts("2024-01-01 00:00:20"), 3L, 80L),
      ScoredEvent(2L, ts("2024-01-01 00:00:30"), 4L, 10L),
      ScoredEvent(1L, ts("2024-01-01 00:01:10"), 5L, 60L))
    // after batch 1 the watermark sits at 00:01:00 (max ts − 10 s):
    // window 0 is final, window 1 still open → the 00:01:50 event merges
    // cross-batch into window 1, and the 00:00:55 event is LATE (below
    // the watermark) and must be dropped — standard streaming semantics
    val late = ScoredEvent(1L, ts("2024-01-01 00:00:55"), 11L, 99L)
    val b2 = Seq(
      ScoredEvent(1L, ts("2024-01-01 00:01:50"), 8L, 90L),
      late,
      ScoredEvent(2L, ts("2024-01-01 00:01:30"), 6L, 70L),
      ScoredEvent(1L, ts("2024-01-01 00:02:15"), 2L, 30L))
    // watermark pusher: far enough that every window above finalizes
    val pusher = Seq(ScoredEvent(2L, ts("2024-01-01 01:00:00"), 99L, 1L))

    val stream = MemoryStream[ScoredEvent]
    val q = StreamingOps.streamingGroupTopK(stream.toDS(), winUs, k = 2, "10 seconds")
      .writeStream.outputMode("append").format("memory").queryName("topk_out").start()
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      stream.addData(pusher); q.processAllAvailable()
      // one extra empty pass lets event-time timeouts fire
      stream.addData(Seq.empty[ScoredEvent]); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("topk_out")
      .as[TopKRow].collect().toSeq
      .sortBy(r => (r.key, r.window_start_us, r.rank))

    // independent batch reference over the events that were on time
    val all = (b1 ++ b2).filterNot(_ == late)
    val expected = all.groupBy(e => (e.key, {
        val us = e.ts.getTime * 1000L; us - us % winUs
      }))
      .toSeq.flatMap { case ((key, w), evs) =>
        evs.map(e => (e.item, e.score))
          .sortBy { case (item, score) => (-score, item) }
          .take(2).zipWithIndex
          .map { case ((item, score), i) => TopKRow(key, w, i + 1, item, score) }
      }
      .sortBy(r => (r.key, r.window_start_us, r.rank))
    // the pusher's own window never finalizes (no later watermark) and
    // must NOT have been emitted; the late event must have been dropped
    assert(!streamed.exists(_.item == 99L))
    assert(!streamed.exists(_.item == 11L))
    assert(streamed == expected)
    // exactly-once per (key, window, rank)
    assert(streamed.map(r => (r.key, r.window_start_us, r.rank)).distinct.size == streamed.size)
  }

  test("streaming group top-k state survives a checkpointed restart") {
    // the per-window heap state (Map of Seq tuples) must round-trip the
    // state store: events arriving BEFORE the restart can only appear in
    // a window finalized AFTER it if the open-window state was recovered
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import StreamingOps.{ScoredEvent, TopKRow}
    def ts(s: String) = Timestamp.valueOf(s)
    val winUs = 60L * 1000000L
    val out = tmpDir() + "/topk_sink"
    val ckpt = tmpDir() + "/topk_ckpt"
    val source = MemoryStream[ScoredEvent]
    def start() = StreamingOps.streamingGroupTopK(source.toDS(), winUs, k = 2, "10 seconds")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    // incarnation 1: two items land in window 0, nothing finalizes
    val q1 = start()
    source.addData(
      ScoredEvent(1L, ts("2024-01-01 00:00:10"), 3L, 80L),
      ScoredEvent(1L, ts("2024-01-01 00:00:20"), 7L, 50L))
    q1.processAllAvailable(); q1.stop()
    // incarnation 2: a third (better) item merges into the recovered
    // window, then the watermark pusher finalizes it
    val q2 = start()
    source.addData(ScoredEvent(1L, ts("2024-01-01 00:00:40"), 8L, 90L))
    q2.processAllAvailable()
    source.addData(ScoredEvent(2L, ts("2024-01-01 01:00:00"), 99L, 1L))
    q2.processAllAvailable()
    source.addData(Seq.empty[ScoredEvent])
    q2.processAllAvailable(); q2.stop()

    val rows = spark.read.parquet(out).as[TopKRow].collect().toSeq
      .sortBy(r => (r.key, r.window_start_us, r.rank))
    val w0 = ts("2024-01-01 00:00:00").getTime * 1000L
    assert(rows == Seq(
      TopKRow(1L, w0, 1, 8L, 90L),
      TopKRow(1L, w0, 2, 3L, 80L)),
      s"open-window heap did not survive the restart: $rows")
  }
}
