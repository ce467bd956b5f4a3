package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * The moderate-skew half of the skew story (SURVEY.md §7.5.8): Salting
 * covers pathological single-key skew explicitly; this spec proves AQE's
 * runtime skew-join split handles the moderate case with NO operator
 * change — the plan the engine relies on at 100 TB when one token range
 * is 100× its siblings. Thresholds are lowered so the sf-test-size
 * fixture triggers the same OptimizeSkewedJoin rule a production
 * partition would.
 */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition at runtime") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      // 90% of the fact rows share key 0 — one shuffle partition dwarfs
      // the rest; the dim side is uniform.
      val fact = spark.range(0, 60000)
        .select(
          when(pmod($"id", lit(10)) < 9, 0L).otherwise(pmod($"id", lit(50L))).as("k"),
          concat(lit("payload-"), $"id").as("payload"))
      val dim = spark.range(0, 50).select($"id".as("k"), concat(lit("d"), $"id").as("dval"))
      val joined = fact.join(dim, Seq("k"))
      // execute THIS DataFrame (collect, not count — count builds a new
      // QueryExecution) so its AdaptiveSparkPlan reaches the final plan
      assert(joined.collect().length === 60000)
      // materialized AQE final plan must show the skew-split join
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"not an adaptive final plan:\n$plan")
      assert(plan.contains("skew=true"), s"skew join split did not trigger:\n$plan")
    }
  }

  test("salted join spreads a pathological key without AQE") {
    // the explicit-salt path AQE cannot take (single giant build group):
    // result parity with the plain join, hot key spread across salt buckets
    val skewed = spark.range(0, 1000).select(lit(7L).as("k"), $"id".as("v"))
    val dim = Seq((7L, "hot"), (8L, "cold")).toDF("k", "dval")
    val salted = Salting.saltedEquiJoin(skewed, dim, Seq("k"), salt = 8)
    assert(salted.count() === 1000L)
    val plain = skewed.join(dim, Seq("k"))
    assert(salted.select("k", "v", "dval").exceptAll(plain.select("k", "v", "dval")).isEmpty)
  }
}
