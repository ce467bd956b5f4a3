package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Runtime-filter posture (SURVEY.md §4): when a selective dimension
 * filter feeds a shuffle join, Spark can inject a bloom filter built
 * from the dim side into the fact scan — at 100 TB this prunes fact
 * rows BEFORE the shuffle, the single biggest I/O lever after partition
 * pruning. Thresholds are lowered so the fixture-sized join triggers
 * the same InjectRuntimeFilter rule a production join would.
 */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom filter into the fact side of a shuffle join") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val fact = graft.io.TableIO.read(spark, Sf, "lineitem")
      val dim = graft.io.TableIO.read(spark, Sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"no runtime bloom filter injected:\n${plan.take(3000)}")
      // the filter is a pruning hint, never a correctness device: result
      // parity with the un-filtered plan
      val n = joined.collect().map(_.getLong(1)).sum
      val expected = fact.join(dim, fact("l_orderkey") === dim("o_orderkey")).count()
      assert(n === expected)
    }
  }
}
