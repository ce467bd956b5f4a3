package graft.run

import graft.SparkSpec
import graft.config.CdmConfig
import org.apache.spark.sql.functions._

class TrackedMigrateSpec extends SparkSpec {
  import spark.implicits._

  private def cfg(target: String, ledger: String, prev: Option[String]) = CdmConfig.fromMap(Map(
    "spark.cdm.connect.origin.path" -> Sf,
    "spark.cdm.connect.target.path" -> target,
    "spark.cdm.schema.origin.keyspaceTable" -> "orders",
    "spark.cdm.schema.origin.primaryKey" -> "o_orderkey",
    "spark.cdm.perfops.numParts" -> "8",
    "spark.cdm.trackRun" -> "true",
    "spark.cdm.trackRun.ledgerDir" -> ledger
  ) ++ prev.map("spark.cdm.trackRun.previousRunId" -> _))

  test("full tracked run migrates everything and records PASS per bucket") {
    val target = tmpDir(); val ledger = tmpDir()
    val done = TrackedMigrate.run(spark, cfg(target, ledger, None), "run-1")
    assert(done == (0 until 8))
    val out = spark.read.parquet(s"$target/orders.parquet")
    assert(out.count() == spark.read.parquet(s"$Sf/orders.parquet").count())
    val passed = RunLedger.load(spark, ledger)
      .filter($"run_id" === "run-1" && $"status" === RunLedger.Pass).count()
    assert(passed == 8)
  }

  test("resume processes only the buckets the previous run missed") {
    val target = tmpDir(); val ledger = tmpDir()
    // simulate a crashed previous run that completed buckets 0-5 only
    RunLedger.record(spark, ledger, "crashed",
      (0 to 5).toDF("part_id").withColumn("status", lit(RunLedger.Pass)))
    // seed the target with what the crashed run wrote (buckets 0-5)
    val full = cfg(target, ledger, None)
    val seeded = graft.jobs.Migrate.plan(spark, full)
      .withColumn(TrackedMigrate.BucketCol, TrackedMigrate.bucketOf("o_orderkey", 8))
      .filter($"__part" <= 5)
    seeded.write.mode("overwrite").partitionBy(TrackedMigrate.BucketCol)
      .parquet(s"$target/orders.parquet")

    val resumed = TrackedMigrate.run(spark, cfg(target, ledger, Some("crashed")), "run-2")
    assert(resumed == Seq(6, 7))

    // after resume, the target holds the complete table exactly once
    val out = spark.read.parquet(s"$target/orders.parquet")
    val origin = spark.read.parquet(s"$Sf/orders.parquet")
    assert(out.count() == origin.count())
    assert(out.select("o_orderkey").except(origin.select("o_orderkey")).count() == 0)
    assert(out.groupBy("o_orderkey").count().filter($"count" > 1).count() == 0)
  }

  test("a partition file seeds the retry set and the output file empties on success") {
    val target = tmpDir(); val ledger = tmpDir()
    val pfIn = tmpDir() + "/failed_in"; val pfOut = tmpDir() + "/failed_out"
    RunLedger.writePartitionFile(Seq(2, 5).toDF("part_id"), pfIn)
    assert(RunLedger.readPartitionFile(spark, pfIn)
      .as[Int].collect().sorted.toSeq == Seq(2, 5))

    val c = CdmConfig.fromMap(Map(
      "spark.cdm.connect.origin.path" -> Sf,
      "spark.cdm.connect.target.path" -> target,
      "spark.cdm.schema.origin.keyspaceTable" -> "orders",
      "spark.cdm.schema.origin.primaryKey" -> "o_orderkey",
      "spark.cdm.perfops.numParts" -> "8",
      "spark.cdm.trackRun" -> "true",
      "spark.cdm.trackRun.ledgerDir" -> ledger,
      "spark.cdm.tokenrange.partitionFile.input" -> pfIn,
      "spark.cdm.tokenrange.partitionFile.output" -> pfOut))
    val done = TrackedMigrate.run(spark, c, "retry-1")
    assert(done == Seq(2, 5))
    // only the seeded buckets were written
    val written = spark.read.parquet(s"$target/orders.parquet")
      .select(TrackedMigrate.BucketCol).distinct().as[Int].collect().sorted.toSeq
    assert(written == Seq(2, 5))
    // success => the output failed-ranges file exists and is empty
    assert(RunLedger.readPartitionFile(spark, pfOut).count() == 0)
  }
}
