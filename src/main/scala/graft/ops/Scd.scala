package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Slowly-changing-dimension (type 2) build from a change log — the
 * warehouse-side completion of the reconciliation surface (SURVEY.md
 * §2.5/§2.6): where DiffData answers "how do origin and target differ
 * NOW", an SCD-2 dimension answers "what was the value WHEN". The
 * reference's writetime-preserving migration (T8/T9) exists precisely
 * because rows carry history; this operator materializes that history as
 * validity intervals.
 *
 * Scale posture: one shuffle on the entity key; the change-detection lag,
 * the version row_number, and the valid-to lead all share that single
 * sort — Catalyst plans one Window over one Exchange. No joins, no
 * driver-side state; 100 TB of change log costs exactly one key-partition
 * pass.
 */
object Scd {

  /**
   * Collapse a change log into SCD-2 validity intervals.
   *
   * For each `keyCol`, events ordered by (`tsCol`, `tieCol`) — the tie
   * column makes equal-timestamp order deterministic — are reduced to the
   * rows where `stateCol` CHANGES; each surviving row opens an interval
   * `[valid_from_us, valid_to_us)` closed by the next change (null = still
   * current). Consecutive duplicates of the same state collapse into the
   * earlier interval, matching the upstream-warehouse SCD-2 contract.
   */
  def scd2FromChangeLog(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, stateCol: String): DataFrame = {
    SqlTypes.requireFreeColumns(df,
      Seq("__rn", "__prev_state", "version", "valid_from_us", "valid_to_us", "is_current")
        .filterNot(Seq(keyCol, tsCol, tieCol, stateCol).contains))
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    // NULL is a real state: change detection must be null-safe (<=>), and
    // "no previous row" must be distinguished from "previous state was
    // null" (lag returns null for both) — row_number does that. Plain
    // =!= would drop transitions INTO null (three-valued logic) and emit
    // duplicate intervals for consecutive nulls.
    val changes = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev_state", lag(col(stateCol), 1).over(w))
      .filter(col("__rn") === 1 || !(col("__prev_state") <=> col(stateCol)))
      .drop("__rn")
    // second window over the FILTERED rows: same key partitioning, so the
    // exchange is reused; only the sort re-runs on the (much smaller)
    // change set
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from_us", unix_micros(col(tsCol)))
      .withColumn("valid_to_us", lead(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
      .select(col(keyCol), col(stateCol).as("state"),
        col("version"), col("valid_from_us"), col("valid_to_us"), col("is_current"))
  }
}
