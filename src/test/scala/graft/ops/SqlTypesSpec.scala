package graft.ops

import graft.SparkSpec

/** Pins [[SqlTypes.requireWindowGroupLimit]] to InferWindowGroupLimit's
 * actual 4.1.2 semantics (r16 advisor): the optimizer plants the partial
 * top-k when `limit <= threshold` (so k == threshold is VALID and must
 * pass), and the rule is fully disabled at threshold = -1 (so the guard
 * must THROW there — a disabled rule is the silent one-reducer funnel
 * the guard exists to catch, not a free pass). */
class SqlTypesSpec extends SparkSpec {

  private val Key = "spark.sql.optimizer.windowGroupLimitThreshold"
  private def df = spark.range(10).toDF("id")

  test("k strictly below the threshold passes") {
    withConf(Key -> "100") {
      SqlTypes.requireWindowGroupLimit(df, 99)
    }
  }

  test("k == threshold passes: InferWindowGroupLimit applies at limit <= threshold") {
    withConf(Key -> "100") {
      SqlTypes.requireWindowGroupLimit(df, 100)
    }
  }

  test("k above the threshold throws") {
    withConf(Key -> "100") {
      val e = intercept[IllegalArgumentException] {
        SqlTypes.requireWindowGroupLimit(df, 101)
      }
      assert(e.getMessage.contains("windowGroupLimitThreshold"))
    }
  }

  test("threshold = -1 (rule disabled) throws for ANY k — the exact silent failure the guard targets") {
    withConf(Key -> "-1") {
      val e = intercept[IllegalArgumentException] {
        SqlTypes.requireWindowGroupLimit(df, 1)
      }
      assert(e.getMessage.contains("disabled"), e.getMessage)
    }
  }
}
