package graft.jobs

import graft.SparkSpec

/** Wrapper parity for the execution-mode gate and the manual-mode
 * park-and-redispatch loop (entrypoint.sh:228-259,288;
 * spark-submit-cdm:1-39). */
class ExecutionModeSpec extends SparkSpec {
  import spark.implicits._

  test("mode strings are exact-match; anything else is the wrapper's hard error") {
    assert(ExecutionMode.resolve("auto") == ExecutionMode.Auto)
    assert(ExecutionMode.resolve("manual") == ExecutionMode.Manual)
    // shell `=` is case-sensitive: AUTO is NOT auto (entrypoint.sh:228)
    for (bad <- Seq("AUTO", "Manual", "", "batch")) {
      val e = intercept[IllegalArgumentException](ExecutionMode.resolve(bad))
      assert(e.getMessage ==
        s"Unrecognised execution mode '$bad'. Please specify either 'auto' or 'manual'.")
    }
  }

  test("park message matches the wrapper's two shapes") {
    assert(ExecutionMode.parkMessage(Some("migrate")) ==
      "Run 'spark-submit-cdm' to launch the 'migrate' job, or run 'spark-submit-cdm <job>' to launch a different CDM job.")
    assert(ExecutionMode.parkMessage(None) ==
      "Run 'spark-submit-cdm <job>' to launch a CDM job.")
    // empty CDM_JOB_NAME is unset to the wrapper's [ -n ] test
    assert(ExecutionMode.parkMessage(Some("")) ==
      "Run 'spark-submit-cdm <job>' to launch a CDM job.")
  }

  test("live-target validate snapshots via reliable checkpoint when a dir is set") {
    // production posture: with a checkpoint dir configured the report
    // snapshot must survive executor loss (localCheckpoint blocks die
    // with their executor; df.checkpoint() writes to the dir)
    val ckpt = tmpDir()
    spark.sparkContext.setCheckpointDir(ckpt)
    try {
      import graft.io.{CassandraTableIO, MemCqlStore}
      val origin = tmpDir()
      Seq((1L, "a"), (2L, "b")).toDF("pk", "v").write.parquet(s"$origin/t.parquet")
      val schema = spark.read.parquet(s"$origin/t.parquet").schema
      MemCqlStore.dropAll()
      MemCqlStore.create("mem-ckpt", "t", schema, primaryKey = Seq("pk"), partitionKey = Seq("pk"))
      MemCqlStore.insert("mem-ckpt", "t", Seq(Seq(1L, "a"), Seq(2L, "b")))
      withConf(CassandraTableIO.FormatConf -> "graft.io.MemCqlProvider") {
        val cfg = graft.config.CdmConfig.fromMap(Map(
          "spark.cdm.connect.origin.path" -> origin,
          "spark.cdm.connect.target.host" -> "mem-ckpt", // live target → snapshot path
          "spark.cdm.schema.origin.keyspaceTable" -> "t",
          "spark.cdm.schema.origin.primaryKey" -> "pk"))
        val report = JobDispatch.run(spark, "validate", cfg)
        assert(report.select("diff_class").as[String].collect().toSet == Set("VALID"))
      }
      // the reliable checkpoint actually landed in the configured dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      try assert(wrote.filter(java.nio.file.Files.isRegularFile(_)).count() > 0,
        "no checkpoint files written — localCheckpoint fallback used despite a configured dir")
      finally wrote.close()
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("parked session runs sequential jobs and re-reads config per submit") {
    val origin = tmpDir(); val target = tmpDir(); val target2 = tmpDir()
    Seq((1L, "a"), (2L, "b")).toDF("pk", "v").write.parquet(s"$origin/t.parquet")
    val props = java.nio.file.Files.createTempFile("cdm", ".properties")
    def writeProps(tgt: String): Unit = java.nio.file.Files.writeString(props,
      s"""spark.cdm.connect.origin.path=$origin
         |spark.cdm.connect.target.path=$tgt
         |spark.cdm.schema.origin.keyspaceTable=t
         |spark.cdm.schema.origin.primaryKey=pk
         |""".stripMargin)
    writeProps(target)
    val parked = new ParkedSession(spark, Map("CDM_JOB_NAME" -> "migrate"), Some(props.toString))
    // launch 1: env-named migrate writes the first target
    assert(parked.submit().count() == 2)
    // properties edited while parked; launch 2 overrides the job by arg —
    // validate must see the NEW target (config re-read per submit)
    writeProps(target2)
    Seq((1L, "a"), (2L, "b")).toDF("pk", "v").write.parquet(s"$target2/t.parquet")
    val report = parked.submit(Some("validate"))
    assert(report.select("diff_class").as[String].collect().toSet == Set("VALID"))
    // launch 3: unknown names rejected with the script's message
    val e = intercept[IllegalArgumentException](parked.submit(Some("compact")))
    assert(e.getMessage.contains("Unrecognised job name"))
    // no arg and no env job name = the script's empty-name rejection
    val bare = new ParkedSession(spark, Map.empty, Some(props.toString))
    intercept[IllegalArgumentException](bare.submit())
  }
}
