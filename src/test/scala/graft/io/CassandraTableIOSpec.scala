package graft.io

import graft.config.{CdmConfig, ClusterConfig, TlsConfig}
import org.scalatest.funsuite.AnyFunSuite

/** The connector backend can't reach a live cluster in this sandbox; what
 * IS testable is the pure ClusterConfig → spark.cassandra.* option
 * mapping and the backend dispatch seam. */
class CassandraTableIOSpec extends AnyFunSuite {

  test("maps contact-point + TLS config onto connector options") {
    val c = ClusterConfig(
      path = "", host = Some("10.0.0.1"), port = Some(9042),
      username = Some("u"), password = Some("p"),
      tls = TlsConfig(enabled = true, trustStorePath = Some("/ts.jks"),
        trustStorePassword = Some("tsp"), trustStoreType = "PKCS12",
        keyStorePath = Some("/ks.jks"), keyStorePassword = Some("ksp"),
        enabledAlgorithms = Some("TLS_RSA_WITH_AES_256_CBC_SHA")))
    val o = CassandraTableIO.connectorOptions(c)
    assert(o("spark.cassandra.connection.host") == "10.0.0.1")
    assert(o("spark.cassandra.connection.port") == "9042")
    assert(o("spark.cassandra.auth.username") == "u")
    assert(o("spark.cassandra.connection.ssl.enabled") == "true")
    assert(o("spark.cassandra.connection.ssl.trustStore.type") == "PKCS12")
    assert(o("spark.cassandra.connection.ssl.clientAuth.enabled") == "true")
    assert(!o.contains("spark.cassandra.connection.config.cloud.path"))
  }

  test("maps an SCB config and consistency passthrough") {
    val c = ClusterConfig(path = "", scb = Some("/astra/scb.zip"),
      username = Some("token"), password = Some("AstraCS:x"))
    val perf = CdmConfig.fromMap(Map(
      "spark.cdm.perfops.consistency.read" -> "LOCAL_ONE",
      "spark.cdm.perfops.consistency.write" -> "EACH_QUORUM")).perf
    val o = CassandraTableIO.connectorOptions(c, Some(perf))
    assert(o("spark.cassandra.connection.config.cloud.path") == "/astra/scb.zip")
    assert(!o.contains("spark.cassandra.connection.host"))
    assert(o("spark.cassandra.input.consistency.level") == "LOCAL_ONE")
    assert(o("spark.cassandra.output.consistency.level") == "EACH_QUORUM")
    assert(o("spark.cassandra.output.batch.grouping.key") == "partition")
  }

  test("splits keyspace.table and defaults a bare table name") {
    assert(CassandraTableIO.splitKeyspaceTable("ks.tbl") == (("ks", "tbl")))
    assert(CassandraTableIO.splitKeyspaceTable("tbl") == (("cdm", "tbl")))
  }

  test("path-only clusters dispatch to the parquet backend") {
    val spark = graft.TestSpark.spark
    val df = TableIO.read(spark, ClusterConfig(path = "/root/testdata/sf0.001"), "region")
    assert(df.count() == 5)
  }

  /** Live-connector smoke: runs ONLY when the spark-cassandra-connector
   * is on the classpath (it is not in this zero-egress sandbox — the
   * test then cancels, not fails). With the jars present it proves the
   * two things testable without a live cluster: (1) Spark resolves the
   * `org.apache.spark.sql.cassandra` DataSource [[CassandraTableIO.read]]
   * names, and (2) every option emitted by `connectorOptions` passes the
   * connector's own `ConfigCheck` validator — the guard against a typo'd
   * option silently ignored at a real cluster (the reference wires these
   * through spark-submit properties, entrypoint.sh:274-283). */
  test("connector smoke (skips without spark-cassandra-connector jars)") {
    val connectorPresent =
      try { Class.forName("com.datastax.spark.connector.util.ConfigCheck$"); true }
      catch { case _: ClassNotFoundException => false }
    assume(connectorPresent, "spark-cassandra-connector not on classpath")

    // (1) the DataSource name used by CassandraTableIO.read resolves
    val lookup = org.apache.spark.sql.execution.datasources.DataSource
      .lookupDataSource(CassandraTableIO.Format, graft.TestSpark.spark.sessionState.conf)
    assert(lookup != null, s"DataSource ${CassandraTableIO.Format} did not resolve")

    // (2) the full option surface validates against the connector's own
    // known-property check (reflective: the class only exists with jars)
    val c = ClusterConfig(
      path = "", host = Some("127.0.0.1"), port = Some(9042),
      username = Some("u"), password = Some("p"),
      tls = TlsConfig(enabled = true, trustStorePath = Some("/ts.jks"),
        trustStorePassword = Some("tsp"), trustStoreType = "JKS",
        keyStorePath = Some("/ks.jks"), keyStorePassword = Some("ksp"),
        enabledAlgorithms = Some("TLS_RSA_WITH_AES_256_CBC_SHA")))
    val perf = CdmConfig.fromMap(Map.empty).perf
    val sparkConf = new org.apache.spark.SparkConf(false)
    CassandraTableIO.connectorOptions(c, Some(perf)).foreach { case (k, v) =>
      sparkConf.set(k, v)
    }
    val module = Class.forName("com.datastax.spark.connector.util.ConfigCheck$")
    val instance = module.getField("MODULE$").get(null)
    val check = module.getMethods.find(_.getName == "checkConfig")
      .getOrElse(fail("ConfigCheck.checkConfig not found"))
    // throws ConnectorConfigurationException on any unknown property
    check.invoke(instance, sparkConf)
  }
}
