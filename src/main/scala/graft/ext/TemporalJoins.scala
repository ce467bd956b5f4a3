package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators the reference lacks (SURVEY.md §2.5 notes the
 * reference has only PK equi-joins) but a time-series/training-data
 * pipeline needs constantly: as-of ("latest right row at or before each
 * left row") and bounded range ("right rows inside a window after each
 * left row"). Both are built so the physical plan is an equi-shuffle —
 * never a BroadcastNestedLoopJoin, which is what a naive `l.ts >= r.ts`
 * join condition degenerates to and what dies first at 100 TB.
 */
object TemporalJoins {

  /**
   * Backward as-of join: for every left row, the greatest right `tsCol`
   * <= the left row's `tsCol`, within the same `keyCols` group (DuckDB
   * `ASOF JOIN ... ON l.key = r.key AND l.ts >= r.ts` semantics; the
   * oracle runs exactly that).
   *
   * Implementation is the union-tag trick, not a join: tag right rows 0
   * and left rows 1, union, then one window per key ordered by (ts, tag)
   * carries `max(ts of tag-0 rows so far)` forward onto each left row.
   * Cost = ONE shuffle on `keyCols` and no join at all — the classic
   * sort-merge-as-of without the merge: at 1000 executors this is a
   * single exchange of both inputs, and the per-key sort is exactly what
   * a range-interval as-of join would have needed anyway. `max` (not
   * `last`) keeps the result independent of intra-tie row order.
   *
   * Returns the left rows plus `asofCol` (timestamp of the matched right
   * row, null when no right row precedes).
   */
  def asofBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, asofCol: String): DataFrame = {
    val lCols = left.columns
    val l = left.withColumn("__side", lit(1))
    val r = right.select((keyCols :+ tsCol).map(col): _*).withColumn("__side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left at equal ts => inclusive (<=) semantics
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn(asofCol, max(when(col("__side") === 0, col(tsCol))).over(w))
      .filter(col("__side") === 1)
      .select((lCols.map(col) :+ col(asofCol)).toIndexedSeq: _*)
  }

  /**
   * Bounded range join: pairs (left, right) with equal `keyCols` and
   * right.ts in [left.ts, left.ts + windowMicros). The inequality is
   * decomposed into an EQUI-join on (key, coarse time bucket) plus a
   * residual filter: bucket width = the window length, so a right row
   * landing in [l, l+d) lives in the left row's bucket k or k+1 — the
   * left side explodes to those two candidate buckets and everything
   * else is a hash join. Work is O(|l| + |r| + |matches|) with one
   * shuffle per side; a naive `r.ts between l.ts and l.ts + d` condition
   * instead plans a nested-loop join that is quadratic per key.
   *
   * Right columns are returned suffixed `_r` (key columns and ts
   * included) so callers can aggregate matches per left row.
   */
  /** `joinType` "inner" for match pairs, "left_outer" to keep zero-match
   * left rows (exploded candidates make at most one spurious null row per
   * unmatched candidate bucket — `count(right col)` aggregation per left
   * key absorbs them). */
  def rangeJoinBucketed(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, windowMicros: Long, joinType: String = "inner"): DataFrame = {
    require(windowMicros > 0, s"window must be positive, got $windowMicros")
    val bucket = (c: Column) => floor(unix_micros(c) / lit(windowMicros))
    val l = left
      .withColumn("__bucket_l", explode(array(bucket(col(tsCol)), bucket(col(tsCol)) + 1)))
    val r = right
      .select(right.columns.map(c => col(c).as(s"${c}_r")).toIndexedSeq: _*)
      .withColumn("__bucket_r", bucket(col(s"${tsCol}_r")))
    val keyCond = keyCols.map(k => l(k) === r(s"${k}_r")).reduce(_ && _)
    l.join(r, keyCond && l("__bucket_l") === r("__bucket_r")
        && r(s"${tsCol}_r") >= l(tsCol)
        && unix_micros(r(s"${tsCol}_r")) < unix_micros(l(tsCol)) + lit(windowMicros),
        joinType)
      .drop("__bucket_l", "__bucket_r")
  }
}
