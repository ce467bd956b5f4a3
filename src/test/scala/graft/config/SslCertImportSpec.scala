package graft.config

import org.scalatest.funsuite.AnyFunSuite
import java.io.FileInputStream
import java.nio.file.{Files, Paths}
import java.security.KeyStore
import scala.sys.process._

/** End-to-end truststore import against REAL X.509 material: keytool
 * (part of the JDK this library runs on) generates the certs, the
 * library's pure-KeyStore import does the work, and the assertions load
 * the result back through the same API a TLS handshake would. */
class SslCertImportSpec extends AnyFunSuite {

  private def tmpDir(): String =
    Files.createTempDirectory("ssl-import-test").toString

  /** Self-signed cert via keytool -genkeypair + -exportcert. */
  private def makeCert(dir: String, name: String): String = {
    val ks = s"$dir/$name-src.p12"
    val cert = s"$dir/$name.cer"
    val gen = Seq("keytool", "-genkeypair", "-alias", name, "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "1", "-dname", s"CN=$name",
      "-keystore", ks, "-storepass", "changeit", "-storetype", "PKCS12")
    val exp = Seq("keytool", "-exportcert", "-alias", name, "-file", cert,
      "-keystore", ks, "-storepass", "changeit")
    assert(gen.! == 0, s"keytool -genkeypair failed for $name")
    assert(exp.! == 0, s"keytool -exportcert failed for $name")
    cert
  }

  test("imports every cert set from the settings JSON into the truststore") {
    val dir = tmpDir()
    val certA = makeCert(dir, "cass-node-a")
    val certB = makeCert(dir, "cass-node-b")
    val truststore = s"$dir/truststore.p12"
    val settings = s"$dir/ssl-settings.json"
    // intentionally unsorted key order: the reference's jq keys[] sorts
    Files.writeString(Paths.get(settings),
      s"""{
         |  "zeta_cluster": {"alias": "node-b", "file": "$certB",
         |                   "keystore": "$truststore", "storepass": "tsp"},
         |  "alpha_cluster": {"alias": "node-a", "file": "$certA",
         |                    "keystore": "$truststore", "storepass": "tsp"}
         |}""".stripMargin)

    val imported = SslCertImport.importAll(Some(settings))
    assert(imported == Seq("node-a", "node-b"), "cert sets must import in sorted-name order")

    val ks = KeyStore.getInstance("PKCS12")
    val in = new FileInputStream(truststore)
    try ks.load(in, "tsp".toCharArray) finally in.close()
    assert(ks.containsAlias("node-a") && ks.containsAlias("node-b"))
    assert(ks.isCertificateEntry("node-a"), "must import as a trusted-cert entry, not a key entry")
    // the stored cert is byte-identical to the exported one
    val onDisk = java.security.cert.CertificateFactory.getInstance("X.509")
      .generateCertificate(new FileInputStream(certA))
    assert(ks.getCertificate("node-a") == onDisk)
  }

  test("duplicate alias is refused, like keytool -noprompt") {
    val dir = tmpDir()
    val cert = makeCert(dir, "dup")
    val ci = SslCertImport.CertImport("s", "dup-alias", cert, s"$dir/ts.p12", "tsp")
    SslCertImport.importCert(ci)
    val e = intercept[IllegalArgumentException](SslCertImport.importCert(ci))
    assert(e.getMessage.contains("already exists"))
  }

  test("importing into an existing JKS truststore preserves the JKS format") {
    // keytool preserves the store format of an existing truststore; a
    // PKCS12-hardcoded write-back would silently convert it. Build a JKS
    // store with keytool, import through the library, then verify the
    // on-disk file still carries the JKS magic AND still loads as JKS.
    val dir = tmpDir()
    val seed = makeCert(dir, "jks-seed")
    val extra = makeCert(dir, "jks-extra")
    val ts = s"$dir/legacy-truststore.jks"
    val imp = Seq("keytool", "-importcert", "-noprompt", "-alias", "seed",
      "-file", seed, "-keystore", ts, "-storepass", "tspass", "-storetype", "JKS")
    assert(imp.! == 0, "keytool -importcert (JKS seed) failed")
    assert(SslCertImport.storeType(ts) == "JKS")

    SslCertImport.importCert(
      SslCertImport.CertImport("s", "extra", extra, ts, "tspass"))

    val head = Files.readAllBytes(Paths.get(ts)).take(4)
    assert(java.nio.ByteBuffer.wrap(head).getInt == 0xFEEDFEED,
      "write-back converted the JKS truststore to another format")
    val ks = KeyStore.getInstance("JKS")
    val in = new FileInputStream(ts)
    try ks.load(in, "tspass".toCharArray) finally in.close()
    assert(ks.containsAlias("seed") && ks.containsAlias("extra"))
    // a store created FROM SCRATCH stays PKCS12 (the modern keytool default)
    assert(SslCertImport.storeType(s"$dir/does-not-exist.p12") == "PKCS12")
  }

  test("no settings env is a no-op; a missing settings file is an error") {
    assert(SslCertImport.importAll(None) == Nil)
    assert(SslCertImport.importAll(Some("")) == Nil)
    val e = intercept[IllegalArgumentException](
      SslCertImport.importAll(Some("/tmp/no-such-settings.json")))
    assert(e.getMessage.contains("Unable to find SSL store settings file"))
  }

  test("a cert set missing a required field names the set and the field") {
    val e = intercept[IllegalArgumentException](SslCertImport.parseSettings(
      """{"broken": {"alias": "a", "file": "/x", "keystore": "/y"}}"""))
    assert(e.getMessage.contains("broken") && e.getMessage.contains("storepass"))
  }
}
