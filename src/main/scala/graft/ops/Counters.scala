package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * S4/A3 — counter-column semantics.
 *
 * Cassandra counter columns cannot be INSERTed; the reference issues
 * `UPDATE ... SET c = c + ?` deltas (`[upstream]` counter branch in
 * `cql/statement/TargetUpdateStatement.java`; autocorrect for counters is
 * flagged separately via `spark.cdm.autocorrect.missing.counter` because a
 * re-applied delta would double-count — SURVEY.md §7.5.4).
 *
 * Spark-native: additive merge = partial aggregation. `groupBy(pk).sum`
 * gets map-side combine from Spark automatically, so the shuffle carries
 * one pre-summed delta per (task, key) — the same wire-cost profile as
 * CDM's batched counter updates, but parallel and spill-safe.
 *
 * Determinism: deltas accumulate through DECIMAL (exact, associative) and
 * only the final merged value is cast back to double, so results are
 * bit-identical regardless of partitioning or the DuckDB oracle's
 * summation order (SURVEY.md §7.5.5).
 */
object Counters {

  def mergeDeltas(df: DataFrame, pkCols: Seq[String], deltaCol: String,
                  precision: Int = 38, scale: Int = 6): DataFrame =
    // (38,6) default: headroom to ~1e32 before a delta would null out
    // under a non-ANSI overflow (the old (18,2) silently rounded
    // sub-cent deltas half-up AND dropped any |delta| ≥ 1e16 from the
    // sum). Values finer than `scale` still round — callers pick the
    // scale of their counter domain (Cassandra counters proper are
    // integral, scale 0).
    df.groupBy(pkCols.map(col): _*)
      .agg(sum(col(deltaCol).cast(s"decimal($precision,$scale)")).cast("double").as("counter_value"))
}
