package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.config.FilterConfig
import graft.io.TableIO

/**
 * P3–P8 — the reference's whole filter surface (SURVEY.md §2.3).
 *
 * All six filters compose as plain Catalyst predicates, so pushdown,
 * pruning and codegen are free; the reference implements the same set as
 * fixed Java row checks (`[upstream] feature/OriginFilterCondition.java`,
 * filter branches in `job/CopyJobSession.java`, `data/PKFactory.java`).
 */
object Filters {

  /** P3 — `spark.cdm.filter.cassandra.whereCondition`: an arbitrary
   * predicate the reference appends to the origin SELECT so it runs inside
   * the source DB. Catalyst pushes `expr(cond)` into the scan the same way
   * (PushedFilters in the physical plan). */
  def where(df: DataFrame, condition: String): DataFrame =
    df.filter(expr(condition))

  /** P4 — token sub-ring restriction
   * (`spark.cdm.filter.cassandra.partition.min/.max`). Production: the
   * connector prunes token ranges at scan planning; harness: pushed
   * predicate over the deterministic token stand-in. */
  def tokenRange(df: DataFrame, pkCol: String, min: Long, max: Long): DataFrame =
    df.filter(TableIO.tokenOf(col(pkCol)).between(min, max))

  /** P5 — writetime window (`spark.cdm.filter.java.writetime.min/.max`),
   * the incremental-migration mechanism: keep rows whose max column
   * writetime (µs) falls inside [min, max]. */
  def writetimeWindow(df: DataFrame, writetimeCol: Column, minMicros: Long, maxMicros: Long): DataFrame =
    df.filter(writetimeCol.between(minMicros, maxMicros))

  /** P6 — column-value skip (`spark.cdm.filter.java.column.name/.value`):
   * drop rows where the named column's string form equals the value. */
  def columnValue(df: DataFrame, name: String, value: String): DataFrame =
    df.filter(!(col(name).cast("string") <=> lit(value)))

  /** P7 — token percentage sampling (`spark.cdm.filter.java.token.percent`):
   * process only pct% of the ring. Deliberately NOT `df.sample` — the
   * sample must be a deterministic function of the key so validation runs
   * and the DuckDB oracle see the same rows (SURVEY.md §7.5.7). */
  def tokenPercent(df: DataFrame, pkCol: String, pct: Int): DataFrame =
    df.filter(TableIO.tokenPercentBucket(col(pkCol)) < pct)

  /** P8 — null-PK skip: rows whose primary key has any null component are
   * skipped (and counted by the job counters, A1). */
  def nonNullPk(df: DataFrame, pkCols: Seq[String]): DataFrame =
    df.filter(pkCols.map(col(_).isNotNull).reduce(_ && _))

  /** Compose every configured filter (order preserves reference semantics:
   * pushdown filters first, then java-side row filters). One-sided
   * token/writetime bounds apply with the missing side open (the
   * reference's incremental-migration idiom is min-only); a configured
   * filter that CANNOT apply (writetime window with no writetime columns,
   * token filters with no PK) fails fast instead of silently migrating
   * everything — E4's philosophy extends to values, not just key names. */
  def applyAll(df: DataFrame, f: FilterConfig, pkCols: Seq[String], writetimeCol: Option[Column]): DataFrame = {
    var d = df
    f.whereCondition.foreach(c => d = where(d, c))
    if (f.tokenMin.isDefined || f.tokenMax.isDefined) {
      require(pkCols.nonEmpty, "token-range filter configured but no primary key set")
      d = tokenRange(d, pkCols.head,
        f.tokenMin.getOrElse(0L), f.tokenMax.getOrElse(graft.io.TableIO.TokenModulus - 1))
    }
    if (f.writetimeMin.isDefined || f.writetimeMax.isDefined) {
      val wt = writetimeCol.getOrElse(throw new IllegalArgumentException(
        "writetime filter configured but no writetime columns available " +
          "(set spark.cdm.schema.origin.column.writetime.names)"))
      d = writetimeWindow(d, wt,
        f.writetimeMin.getOrElse(Long.MinValue), f.writetimeMax.getOrElse(Long.MaxValue))
    }
    for (n <- f.columnName; v <- f.columnValue) d = columnValue(d, n, v)
    if (f.tokenPercent.isDefined) {
      require(pkCols.nonEmpty, "token-percent filter configured but no primary key set")
      d = tokenPercent(d, pkCols.head, f.tokenPercent.get)
    }
    if (pkCols.nonEmpty) d = nonNullPk(d, pkCols)
    d
  }
}
