package graft.ops

import graft.SparkSpec
import graft.config.FilterConfig
import org.apache.spark.sql.functions._

class FiltersSpec extends SparkSpec {
  import spark.implicits._

  private val noFilters = FilterConfig(None, None, None, None, None, None, None, None)

  test("one-sided writetime window (min only) applies — the incremental-migration idiom") {
    val df = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("pk", "wt")
    val out = Filters.applyAll(df,
      noFilters.copy(writetimeMin = Some(150L)),
      Seq("pk"), Some(col("wt")))
    assert(out.select("pk").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("one-sided token range (max only) applies") {
    val df = (1L to 100L).toDF("pk")
    val out = Filters.applyAll(df, noFilters.copy(tokenMax = Some(1000000000L)), Seq("pk"), None)
    val expected = df.filter(graft.io.TableIO.tokenOf($"pk") <= 1000000000L).count()
    assert(out.count() == expected && expected > 0)
  }

  test("writetime filter without writetime columns fails fast instead of silently passing everything") {
    val df = Seq((1L, 100L)).toDF("pk", "wt")
    val e = intercept[IllegalArgumentException] {
      Filters.applyAll(df, noFilters.copy(writetimeMin = Some(1L)), Seq("pk"), None)
    }
    assert(e.getMessage.contains("writetime"))
  }

  test("token filters without a primary key fail fast") {
    val df = Seq((1L, 100L)).toDF("pk", "wt")
    intercept[IllegalArgumentException] {
      Filters.applyAll(df, noFilters.copy(tokenPercent = Some(10)), Nil, None)
    }
  }

  test("ring-token stand-ins stay in int64 for snowflake-scale and negative keys") {
    // a raw pk * 2654435761 overflows past |pk| ~ 3.47e9 (ANSI error);
    // the masked forms must evaluate for the full long domain and land in
    // their documented ranges
    import graft.io.TableIO
    val big = Seq(5000000000L, Long.MaxValue, Long.MinValue, -1L, 42L).toDF("pk")
    val toks = big.select(
        TableIO.tokenOf(col("pk")).as("t"),
        TableIO.tokenPercentBucket(col("pk")).as("b"),
        TableIO.tokenOfCompound(Seq(col("pk"), col("pk"))).as("c"))
      .as[(Long, Long, Long)].collect()
    assert(toks.forall { case (t, b, c) =>
      t >= 0 && t < TableIO.TokenModulus && b >= 0 && b < 100 &&
        c >= 0 && c < TableIO.TokenModulus })
  }

  test("token-percent buckets spread keys allocated in blocks of 100") {
    import graft.io.TableIO
    // keys that are all multiples of 100 (block allocation, second-
    // granularity ms-timestamps): a (pk*m) mod 100 bucket depends only on
    // pk mod 100 and would put ALL of them in one bucket — sampling at
    // 0% or 100% instead of pct%. The high-bit mixing must spread them.
    val df = spark.range(0, 1000).select(($"id" * 100L).as("pk"))
    val buckets = df.select(TableIO.tokenPercentBucket($"pk").as("b"))
      .groupBy("b").count().as[(Long, Long)].collect()
    assert(buckets.length > 50, s"only ${buckets.length} distinct buckets for block-of-100 keys")
    assert(buckets.map(_._2).max < 100, "one bucket dominates — sampling still structured")
  }
}
