package graft.io

import graft.SparkSpec
import graft.config.CdmConfig
import graft.jobs.JobDispatch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * SIT-style connector contract run (SURVEY §5.1 — upstream CDM ships a
 * Cassandra-in-Docker SIT corpus that drives every job against a live
 * pair; this is its shape in the zero-egress sandbox): ONE seeded
 * origin/target pair, all three jobs in sequence, and at every seam the
 * spec asserts the OBSERVED connector behavior — the option map the
 * source was actually addressed with (consistency levels, fetch size,
 * batch sizing), not just what [[CassandraTableIO.connectorOptions]]
 * returns in isolation. MemCql records both per scan and per write.
 */
class MemCqlSitSpec extends SparkSpec {
  import spark.implicits._

  private val Origin = "sit-origin"
  private val Target = "sit-target"

  private def cfg(extra: (String, String)*): CdmConfig = CdmConfig.fromMap(Map(
    "spark.cdm.connect.origin.host" -> Origin,
    "spark.cdm.connect.target.host" -> Target,
    "spark.cdm.schema.origin.keyspaceTable" -> "lineitem",
    "spark.cdm.schema.origin.primaryKey" -> "l_orderkey,l_linenumber",
    // the perfops surface under test (reference property names,
    // SURVEY §2.2 E3 / S3)
    "spark.cdm.perfops.consistency.read" -> "ONE",
    "spark.cdm.perfops.consistency.write" -> "EACH_QUORUM",
    "spark.cdm.perfops.fetchSizeInRows" -> "500",
    "spark.cdm.perfops.batchSize" -> "3"
  ) ++ extra)

  private def seed(): DataFrame = {
    MemCqlStore.dropAll()
    val li = TableIO.read(spark, Sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .filter($"l_orderkey" < 400)
    MemCqlStore.create(Origin, "lineitem", li.schema,
      primaryKey = Seq("l_orderkey", "l_linenumber"), partitionKey = Seq("l_orderkey"))
    MemCqlStore.insert(Origin, "lineitem", li.collect().map(_.toSeq).toSeq)
    MemCqlStore.create(Target, "lineitem", li.schema,
      primaryKey = Seq("l_orderkey", "l_linenumber"), partitionKey = Seq("l_orderkey"))
    val surviving = MemCqlStore.get(Origin, "lineitem").rows.values
      .map(org.apache.spark.sql.Row.fromSeq).toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(surviving, 4), li.schema)
  }

  private def withMemBackend(body: => Unit): Unit =
    withConf(CassandraTableIO.FormatConf -> "graft.io.MemCqlProvider")(body)

  test("migrate → validate → guardrail SIT pass: perfops reach every scan and write seam") {
    val li = seed()
    withMemBackend {
      val c = cfg()

      // ---- job 1: Migrate ------------------------------------------------
      JobDispatch.run(spark, "migrate", c)
      val oScan = MemCqlStore.get(Origin, "lineitem").lastScan.get
      assert(oScan.options.get("spark.cassandra.input.consistency.level").contains("ONE"),
        s"read consistency did not reach the origin scan: ${oScan.options}")
      assert(oScan.options.get("spark.cassandra.input.fetch.sizeinrows").contains("500"))
      assert(oScan.options.get("spark.cassandra.connection.host").contains(Origin))
      val w1 = MemCqlStore.get(Target, "lineitem").lastWrite.get
      assert(w1.options.get("spark.cassandra.output.consistency.level").contains("EACH_QUORUM"),
        s"write consistency did not reach the target sink: ${w1.options}")
      assert(w1.batchRowCap == 3 && w1.maxBatchRows <= 3 && w1.groupingKey == "partition")
      assert(MemCqlStore.get(Target, "lineitem").rows.size == li.count())

      // ---- perturb the target, then job 2: Validate ----------------------
      val st = MemCqlStore.get(Target, "lineitem")
      val dropped = st.rows.keys.take(2).toSeq
      MemCqlStore.synchronized(dropped.foreach(st.rows.remove))
      val victim = st.rows.keys.head
      MemCqlStore.synchronized {
        val qi = st.schema.fieldIndex("l_quantity")
        st.rows(victim) = st.rows(victim).updated(qi, -1.0)
      }
      val report = JobDispatch.run(spark, "validate",
        cfg("spark.cdm.autocorrect.missing" -> "true",
            "spark.cdm.autocorrect.mismatch" -> "true"))
      assert(report.filter($"diff_class" === graft.jobs.DiffData.Missing).count() == 2)
      assert(report.filter($"diff_class" === graft.jobs.DiffData.Mismatch).count() == 1)
      // validate read BOTH sides through the connector with the same perfops
      val tScan = MemCqlStore.get(Target, "lineitem").lastScan.get
      assert(tScan.options.get("spark.cassandra.input.consistency.level").contains("ONE"))
      assert(tScan.options.get("spark.cassandra.input.fetch.sizeinrows").contains("500"))
      // and the autocorrect corrections went through the batched sink
      val w2 = MemCqlStore.get(Target, "lineitem").lastWrite.get
      assert(w2.totalRows == 3 && w2.maxBatchRows <= 3)
      assert(w2.options.get("spark.cassandra.output.consistency.level").contains("EACH_QUORUM"))
      // target healed: a second validate is clean
      val clean = JobDispatch.run(spark, "validate", c)
      assert(clean.filter($"diff_class" =!= graft.jobs.DiffData.Valid).count() == 0)

      // ---- job 3: Guardrail ----------------------------------------------
      // colSizeInKB=0 (default) reports nothing; a 0-KB-threshold check is
      // modeled as no-op, so use a threshold the numeric columns never hit
      val g = JobDispatch.run(spark, "guardrail",
        cfg("spark.cdm.feature.guardrail.colSizeInKB" -> "1"))
      assert(g.count() == 0, "no lineitem cell exceeds 1 KiB")
      val gScan = MemCqlStore.get(Origin, "lineitem").lastScan.get
      assert(gScan.options.get("spark.cassandra.input.consistency.level").contains("ONE"))
    }
  }

  test("an SCB-addressed origin runs the same e2e path; scb+host together fail fast") {
    // E4 contract first: an SCB embeds the endpoint, so combining it with
    // an explicit contact point is a config contradiction
    val e = intercept[IllegalArgumentException](cfg(
      "spark.cdm.connect.origin.scb" -> "/secure-connect-origin.zip"))
    assert(e.getMessage.contains("mutually exclusive"))

    // SCB-only origin: CassandraTableIO emits connection.config.cloud.path
    // INSTEAD of connection.host, and the scan still resolves and runs
    val scb = "/secure-connect-origin.zip"
    MemCqlStore.dropAll()
    val li = TableIO.read(spark, Sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .filter($"l_orderkey" < 100)
    MemCqlStore.create(scb, "lineitem", li.schema,
      primaryKey = Seq("l_orderkey", "l_linenumber"), partitionKey = Seq("l_orderkey"))
    MemCqlStore.insert(scb, "lineitem", li.collect().map(_.toSeq).toSeq)
    MemCqlStore.create(Target, "lineitem", li.schema,
      primaryKey = Seq("l_orderkey", "l_linenumber"), partitionKey = Seq("l_orderkey"))
    withMemBackend {
      val c = CdmConfig.fromMap(Map(
        "spark.cdm.connect.origin.scb" -> scb,
        "spark.cdm.connect.target.host" -> Target,
        "spark.cdm.schema.origin.keyspaceTable" -> "lineitem",
        "spark.cdm.schema.origin.primaryKey" -> "l_orderkey,l_linenumber"))
      JobDispatch.run(spark, "migrate", c)
      val scan = MemCqlStore.get(scb, "lineitem").lastScan.get
      assert(scan.options.get("spark.cassandra.connection.config.cloud.path").contains(scb))
      assert(!scan.options.contains("spark.cassandra.connection.host"),
        "SCB addressing must not also emit a contact point")
      assert(MemCqlStore.get(Target, "lineitem").rows.size ==
        MemCqlStore.get(scb, "lineitem").rows.size)
    }
  }
}
