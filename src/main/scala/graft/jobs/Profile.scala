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
   * ONE aggregation job over the input: null counts, min and max are
   * map-side combined; the exact multi-column `count(DISTINCT)` plans
   * through Expand (input rows × profiled columns feed the shuffle) —
   * the price of exactness. At 100 TB swap `countDistinct` for
   * `approx_count_distinct` (HLL++, one pass, no Expand, ~2% error);
   * the exact form is kept registered because the harness oracle must
   * hash-match. Float/double min/max render through DECIMAL(18,6) —
   * both engines print decimals with full scale, where raw
   * double→string formatting diverges (scientific-notation thresholds).
   */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    def renderable(c: String): Column = df.schema(c).dataType match {
      case DoubleType | FloatType => col(c).cast("decimal(18,6)")
      case _ => col(c)
    }
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}_nulls"),
        countDistinct(col(c)).as(s"__${c}_dist"),
        min(renderable(c)).cast("string").as(s"__${c}_min"),
        max(renderable(c)).cast("string").as(s"__${c}_max"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__${c}_nulls").as("n_null"),
        col(s"__${c}_dist").as("n_distinct"),
        col(s"__${c}_min").as("min_str"),
        col(s"__${c}_max").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
