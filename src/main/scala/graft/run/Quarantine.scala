package graft.run

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Dead-letter routing — the migration-pipeline counterpart of the
 * reference's skip-and-log error handling (SURVEY.md §2.9: upstream logs
 * failed rows/ranges and continues; the partition ledger S5 retries
 * them). Instead of dropping failures on the floor, rows failing any
 * validation rule are ROUTED to a quarantine output with the list of
 * violated rules attached, while clean rows continue to the main sink —
 * no second scan, no driver round-trip.
 */
object Quarantine {

  val RouteCol = "__route"
  val ReasonsCol = "quarantine_reasons"
  val Good = "good"
  val Quarantined = "quarantine"

  /**
   * Classify rows against named validation rules (rule name → predicate
   * that GOOD rows satisfy). Adds [[ReasonsCol]] (comma-joined violated
   * rule names, '' for clean rows) and [[RouteCol]]. A null predicate
   * result counts as a violation — null-checking is exactly what
   * validation rules are for, so nulls must not slip through three-valued
   * logic.
   */
  def classify(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one validation rule")
    graft.ops.SqlTypes.requireFreeColumns(df, Seq(RouteCol, ReasonsCol))
    val reasons = array_join(
      filter(
        array(rules.map { case (name, pred) =>
          when(coalesce(pred, lit(false)), lit(null)).otherwise(lit(name))
        }: _*),
        x => x.isNotNull),
      ",")
    df.withColumn(ReasonsCol, reasons)
      .withColumn(RouteCol, when(col(ReasonsCol) === "", Good).otherwise(Quarantined))
  }

  /**
   * Route a classified frame to disk in ONE pass: `partitionBy` on the
   * route column writes `<dir>/__route=good` and `<dir>/__route=quarantine`
   * from a single scan — at 100 TB the alternative (two filtered writes)
   * reads the input twice. Quarantined rows keep [[ReasonsCol]] so the
   * replay job knows what to fix; partition pruning makes reading either
   * side back free of the other.
   */
  def writeRouted(classified: DataFrame, dir: String): Unit =
    classified.write.mode("overwrite").partitionBy(RouteCol).parquet(dir)
}
