package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.config.SchemaConfig

/**
 * P1/P2 — column projection and origin→target rename.
 *
 * Reference: only columns bound on both clusters (minus the skip list) are
 * selected into the origin CQL statement (`[upstream] schema/CqlTable.java`
 * column binding), and `spark.cdm.schema.origin.column.names.to.target`
 * renames on the way through (`[upstream] properties/KnownProperties.java`).
 *
 * Spark-first: a single `select` with aliases — Catalyst's ColumnPruning
 * then pushes the narrowed ReadSchema all the way into the parquet/
 * connector scan, so unprojected columns are never deserialized
 * (SURVEY.md §4).
 */
object Projection {

  /** Drop skip-listed columns, then apply the rename map in one select.
   * Skipping a primary-key column is a config contradiction (the target
   * write would lose its key) — fail fast, matching E4 and upstream,
   * where PK columns are always bound. */
  def apply(df: DataFrame, schema: SchemaConfig): DataFrame = {
    val skippedPk = schema.primaryKey.filter(schema.skipColumns.contains)
    require(skippedPk.isEmpty,
      s"column.skip removes primary-key column(s): ${skippedPk.mkString(", ")}")
    val kept = df.columns.filterNot(schema.skipColumns.contains)
    val cols = kept.map(c => col(c).as(schema.renameMap.getOrElse(c, c)))
    df.select(cols.toIndexedSeq: _*)
  }

  def project(df: DataFrame, columns: Seq[String]): DataFrame =
    df.select(columns.map(col): _*)

  def rename(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.select(df.columns.map(c => col(c).as(renames.getOrElse(c, c))).toIndexedSeq: _*)
}
