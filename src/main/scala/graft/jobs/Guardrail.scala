package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** CQL-serialized-size estimate for one column (upstream
   * `feature/Guardrail.java` sizes EVERY column's serialized form —
   * collections are exactly where oversized cells live). Variable-width
   * scalars measure their bytes; fixed-width scalars use their CQL widths;
   * collections follow the native-protocol layout: 4-byte element count,
   * then per element a 4-byte length prefix + payload (8 bytes of
   * prefixes per map entry); structs (UDTs) sum their fields. Null
   * elements inside a collection count 4 bytes (their length prefix). */
  def serializedSize(c: Column, dt: DataType): Column = dt match {
    case StringType | BinaryType => octet_length(c).cast("long")
    case LongType | DoubleType | TimestampType => lit(8L)
    case IntegerType | FloatType | DateType => lit(4L)
    case ShortType => lit(2L)
    case ByteType | BooleanType => lit(1L)
    case _: DecimalType => lit(16L)
    case ArrayType(et, _) =>
      lit(4L) + aggregate(c, lit(0L),
        (acc, x) => acc + lit(4L) + coalesce(serializedSize(x, et), lit(0L)))
    case MapType(kt, vt, _) =>
      lit(4L) + aggregate(map_entries(c), lit(0L),
        (acc, e) => acc + lit(8L)
          + coalesce(serializedSize(e.getField("key"), kt), lit(0L))
          + coalesce(serializedSize(e.getField("value"), vt), lit(0L)))
    case st: StructType =>
      st.fields.map(f => coalesce(serializedSize(c.getField(f.name), f.dataType), lit(0L)))
        .reduceOption(_ + _).getOrElse(lit(0L))
    case _ => octet_length(c.cast("string")).cast("long")
  }

  private def sizable(dt: DataType): Boolean = dt match {
    case StringType | BinaryType | _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  /** Per-row sizes for every variable-size column (string/binary AND
   * array/map/struct), the max, and the list of columns over the limit.
   * `thresholdBytes` models colSizeInKB*1024 (the fixtures are small, so
   * tests pass bytes directly). */
  def check(df: DataFrame, pkCols: Seq[String], thresholdBytes: Long): DataFrame = {
    val sized = df.schema.fields
      .filter(f => !pkCols.contains(f.name) && sizable(f.dataType))
      .map(_.name).toSeq
    require(sized.nonEmpty, "guardrail: no variable-size columns to size-check")

    // long, not int: the DuckDB oracle's strlen is BIGINT and the driver
    // compares schemas.
    val sizes: Seq[(String, Column)] =
      sized.map(c => c -> serializedSize(col(c), df.schema(c).dataType))
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
