package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition pruning over the Hive-layout write path: a facet filter
 * must reach the scan as a PartitionFilter and cut the partition count
 * to the matching directories — zero I/O for everything else. */
class PartitionPruneSpec extends SparkSpec {

  test("facet filter prunes a partitioned table to matching directories only") {
    val dir = tmpDir()
    val docs = TableIO.read(spark, Sf, "documents")
    TableIO.writePartitioned(docs, dir, "docs_by_lang", Seq("lang"))

    val scan = spark.read.parquet(s"$dir/docs_by_lang.parquet")
      .filter(col("lang") === "en")
    val p = scan.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(lang"),
      s"facet filter not applied at partition level:\n${p.take(2000)}")
    // execute THIS DataFrame (not a derived count) so its scan metrics
    // populate; result parity with the unpartitioned read
    val expected = docs.filter(col("lang") === "en").count()
    assert(scan.collect().length.toLong === expected)
    // physically: the metrics of the executed scan show one partition
    // (the lang=en directory) out of the five lang values
    val metrics = scan.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f.metrics }
      .head
    assert(metrics("numPartitions").value === 1,
      s"scan read ${metrics("numPartitions").value} partitions, wanted 1 (lang=en)")
  }
}
