package graft.run

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RunLedgerSpec extends SparkSpec {
  import spark.implicits._

  test("record + load + resume round-trip") {
    val dir = tmpDir()
    val statuses = Seq((0, RunLedger.Pass), (1, RunLedger.Fail), (2, RunLedger.Pass), (3, RunLedger.Diff))
      .toDF("part_id", "status")
    RunLedger.record(spark, dir, "run-1", statuses)

    val all = spark.range(0, 6).select($"id".cast("int").as("part_id"))
    val pending = RunLedger.pendingParts(all, RunLedger.load(spark, dir), "run-1")
      .orderBy("part_id").as[Int].collect().toSeq
    // everything except the PASSed 0 and 2 is still owed
    assert(pending == Seq(1, 3, 4, 5))
  }

  test("resume ignores other runs' statuses") {
    val dir = tmpDir()
    RunLedger.record(spark, dir, "run-A", Seq((0, RunLedger.Pass)).toDF("part_id", "status"))
    RunLedger.record(spark, dir, "run-B", Seq((1, RunLedger.Pass)).toDF("part_id", "status"))
    val all = spark.range(0, 3).select($"id".cast("int").as("part_id"))
    val pending = RunLedger.pendingParts(all, RunLedger.load(spark, dir), "run-A")
      .orderBy("part_id").as[Int].collect().toSeq
    assert(pending == Seq(1, 2))
  }
}
