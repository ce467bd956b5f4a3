package graft

import graft.ext.HotKeys
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bit-equivalence of the hot-key-safe cap/count shapes with the window
 * formulation they replace — including the semantics corners a downstream
 * oracle diff would only surface confusingly: null keys (Window groups
 * nulls together; the anti-join must too, via <=>), the exact-cap
 * boundary (> cap drops, == cap keeps), multi-column keys, and row
 * multiplicity preservation under withKeyCounts. */
class HotKeysSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.types._

  private lazy val frame: DataFrame = {
    // key1 x key2 groups: ("a",1) x 3 rows, ("a",2) x 2, (null,1) x 3,
    // (null,null) x 2, ("b",1) x 1 — exercises null-key groups both over
    // and under a cap of 2, and an exact-cap group
    val rows = Seq(
      Row("a", 1, 10L), Row("a", 1, 11L), Row("a", 1, 12L),
      Row("a", 2, 20L), Row("a", 2, 21L),
      Row(null, 1, 30L), Row(null, 1, 31L), Row(null, 1, 32L),
      Row(null, null, 40L), Row(null, null, 41L),
      Row("b", 1, 50L))
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("k1", StringType), StructField("k2", IntegerType),
      StructField("v", LongType))))
  }

  private def windowDrop(df: DataFrame, keys: Seq[String], cap: Long): DataFrame =
    df.withColumn("__n", count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
      .filter(col("__n") <= cap).drop("__n")

  private def sortedRows(df: DataFrame): Seq[Row] =
    df.orderBy(df.columns.map(col): _*).collect().toSeq

  test("dropOverCap == window form: multi-column keys, null groups, exact-cap boundary") {
    for (cap <- Seq(1L, 2L, 3L)) {
      val got = HotKeys.dropOverCap(frame, Seq("k1", "k2"), cap)
      val want = windowDrop(frame, Seq("k1", "k2"), cap)
      assert(sortedRows(got) == sortedRows(want), s"cap=$cap diverged from the window form")
    }
    // cap=2 specifically: ("a",2) and (null,null) sit EXACTLY at the cap
    // and must survive; ("a",1) and (null,1) are over and must drop whole
    val at2 = HotKeys.dropOverCap(frame, Seq("k1", "k2"), 2L).collect()
    assert(at2.length == 5, s"expected 5 survivors at cap=2, got ${at2.length}")
    assert(!at2.exists(r => r.getAs[Long]("v") >= 30L && r.getAs[Long]("v") <= 32L),
      "over-cap null-key group leaked through the anti-join")
    assert(at2.count(r => r.isNullAt(0) && r.isNullAt(1)) == 2,
      "exact-cap all-null group must be kept (null-safe equality)")
  }

  test("dropOverCap single-column key matches the window form") {
    for (cap <- Seq(2L, 4L)) {
      val got = HotKeys.dropOverCap(frame, Seq("k1"), cap)
      val want = windowDrop(frame, Seq("k1"), cap)
      assert(sortedRows(got) == sortedRows(want), s"cap=$cap diverged")
    }
  }

  test("dropOverCap SHUFFLE_HASH fallback (maxBroadcastKeys=0) is bit-identical to broadcast path") {
    val bc = HotKeys.dropOverCap(frame, Seq("k1", "k2"), 2L)
    val sh = HotKeys.dropOverCap(frame, Seq("k1", "k2"), 2L, maxBroadcastKeys = 0)
    assert(sortedRows(sh) == sortedRows(bc), "fallback join diverged from broadcast path")
    assert(sh.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"),
      "gate did not route to the SHUFFLE_HASH anti-join")
    // the shape pin PlanSpec relies on: under genuinely-over-cap data the
    // default path IS a broadcast LEFT ANTI join, never a Window
    val bcPlan = bc.queryExecution.executedPlan.toString
    assert(bcPlan.contains("LeftAnti") && bcPlan.contains("BroadcastHashJoin") &&
      !bcPlan.contains("Window"),
      s"over-cap enforcement is not a broadcast anti-join:\n${bcPlan.take(1500)}")
  }

  test("dropOverCap byte gate (maxBroadcastBytes=0) routes to SHUFFLE_HASH, bit-identical") {
    val bc = HotKeys.dropOverCap(frame, Seq("k1", "k2"), 2L)
    val sh = HotKeys.dropOverCap(frame, Seq("k1", "k2"), 2L, maxBroadcastBytes = 0L)
    assert(sortedRows(sh) == sortedRows(bc), "byte-gate fallback diverged from broadcast path")
    assert(sh.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"),
      "byte gate did not route to the SHUFFLE_HASH anti-join")
  }

  test("dropOverCap with nothing over cap skips the join entirely") {
    // max group size in `frame` is 3, so cap=3 leaves nothing to drop
    val out = HotKeys.dropOverCap(frame, Seq("k1", "k2"), 3L)
    assert(sortedRows(out) == sortedRows(frame), "no-over-cap path changed rows")
    assert(!out.queryExecution.executedPlan.toString.toLowerCase.contains("join"),
      "expected the anti-join to be skipped when no key exceeds the cap")
  }

  test("withKeyCounts == window count: value parity and row multiplicity preserved") {
    val got = HotKeys.withKeyCounts(frame, Seq("k1", "k2"), "n")
    val want = frame.withColumn("n",
      count(lit(1)).over(Window.partitionBy(col("k1"), col("k2"))))
    assert(got.count() == frame.count(), "row multiplicity changed")
    assert(sortedRows(got.select("k1", "k2", "v", "n")) ==
      sortedRows(want.select("k1", "k2", "v", "n")),
      "per-row count values diverged from the window form")
  }

  test("staged input: the caller's lineage is executed once, not per branch") {
    // a projection with a counting marker: if the count branch re-consumed
    // the unstaged lineage (the round-12 regression), the accumulator
    // would see ~2x the row count
    val acc = spark.sparkContext.longAccumulator("evals")
    val marked = frame.filter { _ => acc.add(1); true }
    val out = HotKeys.dropOverCap(marked.toDF(), Seq("k1", "k2"), 2L)
    out.collect()
    assert(acc.value == frame.count(),
      s"lineage executed ${acc.value} row-evals for ${frame.count()} rows — double compute")
  }
}
