package graft.jobs

import graft.SparkSpec
import graft.config.CdmConfig

/** The wrapper's CDM_JOB_NAME dispatch (entrypoint.sh:228-242 /
 * spark-submit-cdm:10-26): case-insensitive aliases, hard error on
 * unknown names, and each job running end-to-end. */
class JobDispatchSpec extends SparkSpec {
  import spark.implicits._

  test("job names resolve case-insensitively with the reference aliases") {
    assert(JobDispatch.resolve("migrate") == JobDispatch.Migrate)
    assert(JobDispatch.resolve("MIGRATE") == JobDispatch.Migrate)
    assert(JobDispatch.resolve("Validate") == JobDispatch.DiffData)
    assert(JobDispatch.resolve("diffdata") == JobDispatch.DiffData)
    assert(JobDispatch.resolve("guardrail") == JobDispatch.GuardrailCheck)
    assert(JobDispatch.resolve("GuardrailCheck") == JobDispatch.GuardrailCheck)
    val e = intercept[IllegalArgumentException](JobDispatch.resolve("compact"))
    assert(e.getMessage.contains("Unrecognised job name"))
  }

  test("dispatched migrate writes the target and returns it") {
    val target = tmpDir()
    val cfg = CdmConfig.fromMap(Map(
      "spark.cdm.connect.origin.path" -> Sf,
      "spark.cdm.connect.target.path" -> target,
      "spark.cdm.schema.origin.keyspaceTable" -> "region",
      "spark.cdm.schema.origin.primaryKey" -> "r_regionkey"))
    val out = JobDispatch.run(spark, "migrate", cfg)
    assert(out.count() == 5)
  }

  test("dispatched validate reports diffs and autocorrects the target") {
    val origin = tmpDir(); val target = tmpDir()
    val o = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("pk", "v")
    o.write.parquet(s"$origin/t.parquet")
    // target: pk=2 mismatches, pk=3 missing
    Seq((1L, "a"), (2L, "WRONG")).toDF("pk", "v").write.parquet(s"$target/t.parquet")
    val cfg = CdmConfig.fromMap(Map(
      "spark.cdm.connect.origin.path" -> origin,
      "spark.cdm.connect.target.path" -> target,
      "spark.cdm.schema.origin.keyspaceTable" -> "t",
      "spark.cdm.schema.origin.primaryKey" -> "pk",
      "spark.cdm.autocorrect.missing" -> "true",
      "spark.cdm.autocorrect.mismatch" -> "true"))
    val report = JobDispatch.run(spark, "validate", cfg)
    val classes = report.select("pk", "diff_class").as[(Long, String)].collect().toMap
    assert(classes == Map(1L -> "VALID", 2L -> "MISMATCH", 3L -> "MISSING"))
    // post-correction, the target equals origin
    val corrected = spark.read.parquet(s"$target/t.parquet")
      .select("pk", "v").as[(Long, String)].collect().toSet
    assert(corrected == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("dispatched guardrail applies colSizeInKB") {
    val cfg = CdmConfig.fromMap(Map(
      "spark.cdm.connect.origin.path" -> Sf,
      "spark.cdm.schema.origin.keyspaceTable" -> "documents",
      "spark.cdm.schema.origin.primaryKey" -> "doc_id",
      "spark.cdm.feature.guardrail.colSizeInKB" -> "1"))
    val out = JobDispatch.run(spark, "guardrail", cfg)
    // violations are exactly the docs whose text exceeds 1 KiB
    val expected = spark.read.parquet(s"$Sf/documents.parquet")
      .filter(org.apache.spark.sql.functions.octet_length($"text") > 1024).count()
    assert(out.count() == expected)
  }
}
