package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.{StreamingOps, TextOps}

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("scd2FromChangeLog collapses duplicate states and chains validity intervals") {
    val log = Seq(
      (1L, 1L, ts(0), "A"),
      (1L, 2L, ts(5), "A"), // duplicate state: collapses into interval 1
      (1L, 3L, ts(10), "B"),
      (1L, 4L, ts(20), "A"), // state can recur: new interval, new version
      (2L, 5L, ts(0), "X"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Scd.scd2FromChangeLog(log, "user_id", "ts", "event_id", "event_type")
      .orderBy("user_id", "version")
      .select("user_id", "state", "version", "valid_from_us", "valid_to_us", "is_current")
      .collect()
    def us(minute: Int) = ts(minute).getTime * 1000L
    assert(out.length == 4)
    assert(out(0).toSeq == Seq(1L, "A", 1, us(0), us(10), false))
    assert(out(1).toSeq == Seq(1L, "B", 2, us(10), us(20), false))
    assert(out(2).toSeq == Seq(1L, "A", 3, us(20), null, true))
    assert(out(3).toSeq == Seq(2L, "X", 1, us(0), null, true))
  }

  test("scd2FromChangeLog treats null as a real state (null-safe change detection)") {
    val log = Seq(
      (1L, 1L, ts(0), Some("A")),
      (1L, 2L, ts(5), None), // transition INTO null must open an interval
      (1L, 3L, ts(10), None), // consecutive null: no duplicate interval
      (1L, 4L, ts(15), Some("A")),
      (2L, 5L, ts(0), None)) // entity starting in null state gets version 1
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Scd.scd2FromChangeLog(log, "user_id", "ts", "event_id", "event_type")
      .orderBy("user_id", "version")
      .select("user_id", "state", "version", "is_current")
      .collect().map(_.toSeq).toSeq
    assert(out == Seq(
      Seq(1L, "A", 1, false),
      Seq(1L, null, 2, false),
      Seq(1L, "A", 3, true),
      Seq(2L, null, 1, true)), s"got $out")
  }

  test("profile renders NaN/Infinity and huge doubles instead of nulling them") {
    val df = Seq(1.5, Double.NaN, Double.PositiveInfinity, 1e13, -2.25)
      .toDF("v")
    val row = graft.jobs.Profile.profile(df, Seq("v")).collect().head
    // NaN sorts above +Infinity in Spark's double ordering
    assert(row.getAs[String]("max_str") == "NaN")
    assert(row.getAs[String]("min_str") == "-2.250000")
    val finite = graft.jobs.Profile.profile(df.filter(!isnan($"v")), Seq("v")).collect().head
    assert(finite.getAs[String]("max_str") == "Infinity")
    val big = graft.jobs.Profile.profile(Seq(1e13, 2.0).toDF("v"), Seq("v")).collect().head
    assert(big.getAs[String]("max_str") == "10000000000000.000000",
      s"huge double nulled: ${big.getAs[String]("max_str")}")
    intercept[IllegalArgumentException](graft.jobs.Profile.profile(df, Seq.empty))
  }

  test("scd2FromChangeLog breaks equal-timestamp ties on the tie column") {
    val log = Seq(
      (1L, 2L, ts(0), "B"), // same ts: event_id orders B after A
      (1L, 1L, ts(0), "A"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Scd.scd2FromChangeLog(log, "user_id", "ts", "event_id", "event_type")
      .orderBy("version").select("state", "version").as[(String, Int)].collect()
    assert(out.toSeq == Seq(("A", 1), ("B", 2)))
  }

  test("sessionizeByGap starts a new session at exactly the gap (>= break)") {
    val events = Seq(
      (1L, 1L, ts(0)),
      (1L, 2L, ts(29)), // < 30 min after previous: same session
      (1L, 3L, ts(59)), // exactly 30 min after previous: NEW session
      (2L, 4L, ts(0)))
      .toDF("user_id", "event_id", "ts")
    val out = StreamingOps.sessionizeByGap(events, "user_id", "ts", "event_id", "30 minutes")
      .orderBy("user_id", "event_id")
      .select("user_id", "event_id", "session_seq").as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (2L, 4L, 1L)))
  }

  test("sparseCosinePairs: identical tf vectors give cos 1, df ceiling prunes stop-terms") {
    // terms pre-hashed: docs 1/2 identical, doc 3 disjoint except a
    // stop-term (99) present in all docs
    val docs = Seq(
      (1L, Array(10L, 10L, 20L, 99L)),
      (2L, Array(10L, 10L, 20L, 99L)),
      (3L, Array(30L, 40L, 99L)))
      .toDF("doc_id", "terms")
    val out = TextOps.sparseCosinePairs(docs, "doc_id", "terms", minDot = 1L, maxTermDf = 2L)
      .orderBy("id_a", "id_b")
      .select("id_a", "id_b", "dot", "cos6").as[(Long, Long, Long, Double)].collect()
    // stop-term 99 (df=3 > 2) is excluded everywhere: pair (1,2) only,
    // dot = 2*2 + 1*1 = 5 over norms sqrt(5)*sqrt(5)
    assert(out.toSeq == Seq((1L, 2L, 5L, 1.0)))
  }
}
