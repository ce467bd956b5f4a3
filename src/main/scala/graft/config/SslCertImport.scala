package graft.config

import java.io.{FileInputStream, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.security.KeyStore
import java.security.cert.CertificateFactory

/**
 * Truststore certificate import — the runtime half of the reference's
 * `import_ssl_certificates` (`/root/reference/entrypoint.sh:188-221`),
 * the last entrypoint function that previously had no analog here
 * ([[TlsConfig]] models only the property → connector-option mapping).
 *
 * The reference reads a JSON settings file (env
 * `CMD_SSL_STORE_SETTINGS_JSON`) mapping cert-set names to
 * `{alias, file, keystore, storepass}` and shells out to
 * `keytool -import -trustcacerts -noprompt` per entry. Here the same
 * semantics run on the pure JDK `KeyStore`/`CertificateFactory` API —
 * no subprocess, same observable result (keytool is itself a thin CLI
 * over these classes):
 *   - the keystore file is created if absent, loaded if present;
 *   - the X.509 certificate is added under the alias as a trusted entry;
 *   - an alias that already exists is an error, matching
 *     `keytool -noprompt` ("alias already exists" → nonzero exit);
 *   - entries import in sorted cert-set-name order (`jq -r 'keys[]'`
 *     sorts object keys).
 *
 * Driver-side configuration plumbing by nature — runs once per job
 * launch before any executor work, never on the data path.
 */
object SslCertImport {

  final case class CertImport(certSet: String, alias: String, file: String,
      keystore: String, storepass: String)

  /** Parse the settings JSON: top-level object of cert-set objects, each
   * carrying the four keytool fields; cert sets in sorted-name order. */
  def parseSettings(json: String): Seq[CertImport] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    require(root != null && root.isObject, "SSL store settings must be a JSON object")
    import scala.jdk.CollectionConverters._
    root.fields().asScala.toSeq.map(e => e.getKey -> e.getValue)
      .sortBy(_._1)
      .map { case (name, node) =>
        def field(f: String): String = {
          val v = node.get(f)
          require(v != null && !v.isNull, s"cert set '$name' is missing '$f'")
          v.asText()
        }
        CertImport(name, field("alias"), field("file"), field("keystore"), field("storepass"))
      }
  }

  /** Store-type probe: keytool PRESERVES the format of an existing store
   * when importing, so write-back must not silently convert a JKS
   * truststore to PKCS12 (the JDK's dual-format load would read it fine
   * and then store() would change the on-disk format). JKS files start
   * with the magic 0xFEEDFEED; anything else (an ASN.1 SEQUENCE) is
   * treated as PKCS12, the modern keytool default for NEW stores. */
  private[config] def storeType(path: String): String = {
    val p = Paths.get(path)
    if (!Files.exists(p)) "PKCS12"
    else {
      val in = new FileInputStream(path)
      val head = new Array[Byte](4)
      try { in.read(head); () } finally in.close()
      val magic = java.nio.ByteBuffer.wrap(head).getInt
      if (magic == 0xFEEDFEED) "JKS" else "PKCS12"
    }
  }

  /** Import one certificate — create-or-load the keystore, refuse a
   * duplicate alias, add the trusted entry, write back in the SAME store
   * format the existing file uses (keytool semantics; new stores are
   * PKCS12, the modern keytool default). */
  def importCert(ci: CertImport): Unit = {
    require(Files.exists(Paths.get(ci.file)), s"certificate file not found: ${ci.file}")
    val ks = KeyStore.getInstance(storeType(ci.keystore))
    val pass = ci.storepass.toCharArray
    if (Files.exists(Paths.get(ci.keystore))) {
      val in = new FileInputStream(ci.keystore)
      try ks.load(in, pass) finally in.close()
    } else ks.load(null, pass)
    require(!ks.containsAlias(ci.alias),
      s"Certificate not imported, alias <${ci.alias}> already exists")
    val certIn = new FileInputStream(ci.file)
    val cert = try CertificateFactory.getInstance("X.509").generateCertificate(certIn)
      finally certIn.close()
    ks.setCertificateEntry(ci.alias, cert)
    // write-then-atomic-rename: an in-place FileOutputStream truncates
    // the existing truststore first, so a crash mid-store would destroy
    // every previously imported certificate; the temp file keeps the
    // old store intact until the new one is durably complete
    val tmp = Paths.get(ci.keystore + ".tmp")
    val out = new FileOutputStream(tmp.toFile)
    try ks.store(out, pass) finally out.close()
    try Files.move(tmp, Paths.get(ci.keystore),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      Files.move(tmp, Paths.get(ci.keystore),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** The full entrypoint behavior: no settings → no-op; a settings path
   * that doesn't exist → error (the reference's `error_exit`); otherwise
   * import every cert set and return the aliases imported, in order. */
  def importAll(settingsPath: Option[String]): Seq[String] = settingsPath match {
    case None | Some("") => Nil
    case Some(p) =>
      require(Files.exists(Paths.get(p)),
        s"Unable to find SSL store settings file $p specified in CMD_SSL_STORE_SETTINGS_JSON")
      val imports = parseSettings(new String(Files.readAllBytes(Paths.get(p)),
        java.nio.charset.StandardCharsets.UTF_8))
      imports.foreach(importCert)
      imports.map(_.alias)
  }
}
