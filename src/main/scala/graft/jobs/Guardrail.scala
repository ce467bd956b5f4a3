package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}

/**
 * J3 — GuardrailCheck: origin-only data-quality scan flagging rows whose
 * serialized column sizes exceed a threshold.
 *
 * Reference entry point: `CDM_JOB_NAME=guardrail|guardrailcheck` dispatches
 * `com.datastax.cdm.job.GuardrailCheck`
 * (`/root/reference/entrypoint.sh:237-239`); `[upstream]
 * feature/Guardrail.java` checks each row's per-column serialized size
 * against `spark.cdm.feature.guardrail.colSizeInKB` and logs violations
 * with PK + offending columns + sizes.
 *
 * Spark-native: one narrow projection computing `octet_length` per checked
 * column plus a pushed filter — no shuffle, no write, scales linearly with
 * the scan.
 */
object Guardrail {

  /** Per-row sizes for every string/binary column, the max, and the list
   * of columns over the limit. `thresholdBytes` models colSizeInKB*1024
   * (the fixtures are small, so tests pass bytes directly). */
  def check(df: DataFrame, pkCols: Seq[String], thresholdBytes: Long): DataFrame = {
    val sized = df.schema.fields
      .filter(f => !pkCols.contains(f.name) &&
        (f.dataType == StringType || f.dataType == BinaryType))
      .map(_.name).toSeq
    require(sized.nonEmpty, "guardrail: no string/binary columns to size-check")

    // long, not int: the DuckDB oracle's strlen is BIGINT and the driver
    // compares schemas.
    val sizes: Seq[(String, Column)] = sized.map(c => c -> octet_length(col(c)).cast("long"))
    val maxSize = sizes.map(_._2).reduce((a, b) => greatest(a, b))
    val offending = array_join(
      filter(
        array(sizes.map { case (c, s) => when(s > thresholdBytes, lit(c)).otherwise(lit(null)) }: _*),
        x => x.isNotNull),
      ",")

    df.select(pkCols.map(col) ++ sizes.map { case (c, s) => s.as(s"bytes_$c") }
        :+ maxSize.as("max_bytes") :+ offending.as("offending_cols"): _*)
      .filter(col("max_bytes") > thresholdBytes)
  }
}
