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
}
