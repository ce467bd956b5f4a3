package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics pins for the temporal joins and layout/text additions:
 * inclusive as-of ties, half-open range-join bounds, bucket-boundary
 * matches, Morton interleave arithmetic. */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def mkTs(rows: Seq[(Long, Long)], idCol: String) =
    rows.toDF(idCol, "us").select(col(idCol), expr("timestamp_micros(us)").as("ts"))
      .withColumn("user_id", lit(1L))

  test("asofBackward picks the greatest right ts <= left ts, inclusive on ties") {
    val left = mkTs(Seq((10L, 1000L), (11L, 2000L), (12L, 2500L)), "l_id")
    val right = mkTs(Seq((20L, 500L), (21L, 2000L)), "r_id").drop("r_id")
    val out = TemporalJoins.asofBackward(left, right, Seq("user_id"), "ts", "asof_ts")
      .select(col("l_id"), unix_micros(col("asof_ts")).as("m")).as[(Long, Long)]
      .collect().toMap
    // l@1000 sees r@500; l@2000 ties r@2000 (inclusive); l@2500 still r@2000
    assert(out === Map(10L -> 500L, 11L -> 2000L, 12L -> 2000L))
  }

  test("asofBackward yields null when no right row precedes") {
    val left = mkTs(Seq((10L, 100L)), "l_id")
    val right = mkTs(Seq((20L, 500L)), "r_id").drop("r_id")
    val out = TemporalJoins.asofBackward(left, right, Seq("user_id"), "ts", "asof_ts")
    assert(out.filter(col("asof_ts").isNull).count() === 1)
  }

  test("rangeJoinBucketed matches across the bucket boundary and is half-open") {
    // window = 1000µs; left at 900 buckets to 0, matches at 900 (incl),
    // 1500 (next bucket), 1899 (last in-range); NOT 1900 (= l+window, excl)
    val left = mkTs(Seq((1L, 900L)), "l_id")
    val right = mkTs(Seq((20L, 900L), (21L, 1500L), (22L, 1899L), (23L, 1900L), (24L, 899L)), "r_id")
    val out = TemporalJoins.rangeJoinBucketed(left, right, Seq("user_id"), "ts", 1000L)
      .select(col("r_id_r")).as[Long].collect().sorted
    assert(out.toSeq === Seq(20L, 21L, 22L))
  }

  test("rangeJoinBucketed left_outer keeps zero-match rows for aggregation") {
    val left = mkTs(Seq((1L, 100L), (2L, 50000L)), "l_id")
    val right = mkTs(Seq((20L, 150L)), "r_id")
    val agg = TemporalJoins.rangeJoinBucketed(left, right, Seq("user_id"), "ts", 1000L, "left_outer")
      .groupBy("l_id").agg(count(col("r_id_r")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(agg === Map(1L -> 1L, 2L -> 0L))
  }

  test("rangeJoinBucketed left_outer is row-level correct: one null row per unmatched left, none per matched") {
    // l_id=1 matches two right rows (and must carry NO extra null row even
    // though only one of its two candidate buckets matched); l_id=2
    // matches nothing and must appear EXACTLY once, null-extended.
    val left = mkTs(Seq((1L, 100L), (2L, 50000L)), "l_id")
    val right = mkTs(Seq((20L, 150L), (21L, 900L)), "r_id")
    val out = TemporalJoins.rangeJoinBucketed(left, right, Seq("user_id"), "ts", 1000L, "left_outer")
      .select(col("l_id"), col("r_id_r")).as[(Long, Option[Long])].collect().sorted
    assert(out.toSeq === Seq((1L, Some(20L)), (1L, Some(21L)), (2L, None)))
  }

  test("temporal joins reject inputs that collide with internal helper columns") {
    val left = mkTs(Seq((1L, 100L)), "l_id")
    val clash = left.withColumn("__side", lit(0))
    intercept[IllegalArgumentException] {
      TemporalJoins.asofBackward(clash, left, Seq("user_id"), "ts", "asof_ts")
    }
    val clashB = left.withColumn("__bucket_l", lit(0L))
    intercept[IllegalArgumentException] {
      TemporalJoins.rangeJoinBucketed(clashB, left, Seq("user_id"), "ts", 1000L)
    }
    // chaining: the output of one range join (carries ts_r) cannot feed a
    // left_outer range join, whose collapse references ts_r by bare name —
    // must fail fast, not throw AMBIGUOUS_REFERENCE mid-analysis
    val chained = TemporalJoins.rangeJoinBucketed(left, left, Seq("user_id"), "ts", 1000L)
    intercept[IllegalArgumentException] {
      TemporalJoins.rangeJoinBucketed(chained, left, Seq("user_id"), "ts", 1000L, "left_outer")
    }
  }

  test("rangeJoinBucketed plans as an equi hash join, never nested-loop") {
    val ev = graft.io.TableIO.read(spark, Sf, "events")
    val p = TemporalJoins.rangeJoinBucketed(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "error"),
        Seq("user_id"), "ts", 300000000L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), s"bad join:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), s"no equi-join:\n$p")
  }

  test("asofBackward is one exchange (the key shuffle), no join operator") {
    val ev = graft.io.TableIO.read(spark, Sf, "events")
    val p = TemporalJoins.asofBackward(
        ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts"),
        ev.filter(col("event_type") === "signup"),
        Seq("user_id"), "ts", "asof_ts")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of should be join-free:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"too many exchanges ($exchanges):\n$p")
  }

  test("asofForward mirrors backward: earliest right >= left, join-free plan") {
    val left = mkTs(Seq((1L, 500L), (2L, 5000L)), "l_id")
    val right = mkTs(Seq((20L, 100L), (21L, 500L), (22L, 900L)), "r_id")
    // l_id=1 at 500 matches the tie (21 at 500, inclusive); l_id=2 at
    // 5000 has no following right row -> null
    val out = TemporalJoins.asofForward(left, right, Seq("user_id"), "ts", "next_ts")
      .select(col("l_id"), unix_micros(col("next_ts")).as("m"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out === Map(1L -> Some(500L), 2L -> None))
    val p = TemporalJoins.asofForward(left, right, Seq("user_id"), "ts", "next_ts")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"forward as-of should be join-free:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, s"extra exchanges:\n$p")
  }

  test("zorder2 interleaves bits (reference values)") {
    // interleave(x=0b101, y=0b011) = y2x2 y1x1 y0x0 = 0b011011... compute
    // against a bit-by-bit reference for a few values
    def ref(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L)((acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
    val cases = Seq((5L, 3L), (0L, 0L), (65535L, 0L), (0L, 65535L), (12345L, 54321L))
    val out = cases.toDF("x", "y")
      .select(Layout.zorder2(col("x"), col("y")).as("z")).as[Long].collect()
    assert(out.toSeq === cases.map { case (x, y) => ref(x, y) })
  }

  test("bigrams and dupWordFrac handle short docs") {
    val out = Seq("a b a", "solo", "x y").toDF("text")
      .select(
        TextOps.bigrams(TextOps.tokens(col("text"))).as("bg"),
        TextOps.dupWordFrac(TextOps.tokens(col("text"))).as("f"))
      .as[(Seq[String], Double)].collect()
    assert(out(0)._1 === Seq("a b", "b a") && math.abs(out(0)._2 - 0.333333) < 1e-6)
    assert(out(1)._1 === Seq.empty && out(1)._2 === 0.0)
    assert(out(2)._1 === Seq("x y") && out(2)._2 === 0.0)
  }

  test("dupWordFrac is 0.0 (not NaN/null) for empty and null token arrays") {
    val out = spark.sql(
      "SELECT stack(2, CAST(array() AS ARRAY<STRING>), CAST(NULL AS ARRAY<STRING>)) AS toks")
      .select(TextOps.dupWordFrac(col("toks")).as("f"))
      .as[Double].collect()
    assert(out.toSeq === Seq(0.0, 0.0))
  }
}
