package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/**
 * Column-profile audit — the "know your data before you migrate it"
 * companion to GuardrailCheck (SURVEY.md §2.3/§3.3, the Deequ-shaped
 * validation every large pipeline runs before a 100 TB copy): one output
 * row per profiled column with row/null/exact-distinct counts and
 * min/max rendered into a uniform string schema.
 */
object Profile {

  /**
   * One PRUNED aggregate per column, unioned. The tempting alternative —
   * a single agg with multi-column `count(DISTINCT)` — plans through
   * Expand, shuffling input rows × profiled columns (measured 9× slower
   * at sf0.1); per-column aggregates instead each scan exactly one
   * column (columnar pruning means total I/O is identical — every
   * profiled column is read once either way) and each distinct count is
   * a two-phase hash aggregate with NO row expansion. The per-column
   * stages are independent, so the scheduler overlaps them. At 100 TB
   * swap `countDistinct` for `approx_count_distinct` (HLL++, fuses all
   * columns into one pass with no distinct shuffle, ~2% error); the
   * exact form is kept registered because the harness oracle must
   * hash-match. Float/double min/max render through DECIMAL(18,6) —
   * both engines print decimals with full scale, where raw
   * double→string formatting diverges (scientific-notation thresholds).
   */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // Float min/max: aggregate the RAW double (so NaN/±Inf/huge outliers
    // — exactly what an audit must surface — participate in the
    // ordering; both engines sort NaN above +Inf), then render: named
    // specials explicitly, finite values through DECIMAL(38,6) (portable
    // full-scale formatting; |v| ≥ 1e32 would still null — far past any
    // physical measurement). An aggregate-on-the-cast instead would
    // silently DROP the extremes from min/max.
    def render(c: String, v: Column): Column = df.schema(c).dataType match {
      case DoubleType | FloatType =>
        when(isnan(v), lit("NaN"))
          .when(v === Double.PositiveInfinity, lit("Infinity"))
          .when(v === Double.NegativeInfinity, lit("-Infinity"))
          .otherwise(v.cast("decimal(38,6)").cast("string"))
      case _ => v.cast("string")
    }
    cols.map { c =>
      df.select(col(c)).agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).as("__min"),
          max(col(c)).as("__max"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"),
          render(c, col("__min")).as("min_str"),
          render(c, col("__max")).as("max_str"))
    }.reduce(_ unionByName _)
  }
}
