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

  test("partition file rejects out-of-int-range and comma-joined lines") {
    val dir = tmpDir()
    // int overflow: digits-only but casts to null -> must be named, not NPE later
    java.nio.file.Files.writeString(java.nio.file.Path.of(s"$dir/pf1"), "1\n4294967296\n")
    val e1 = intercept[IllegalArgumentException](
      RunLedger.readPartitionFile(spark, s"$dir/pf1").collect())
    assert(e1.getMessage.contains("4294967296"))
    // a csv reader would silently truncate "3,4" to 3; text() must reject it
    java.nio.file.Files.writeString(java.nio.file.Path.of(s"$dir/pf2"), "3,4\n")
    val e2 = intercept[IllegalArgumentException](
      RunLedger.readPartitionFile(spark, s"$dir/pf2").collect())
    assert(e2.getMessage.contains("3,4"))
  }
}
