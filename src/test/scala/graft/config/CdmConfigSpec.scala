package graft.config

import org.scalatest.funsuite.AnyFunSuite

class CdmConfigSpec extends AnyFunSuite {

  test("parses the full property surface") {
    val cfg = CdmConfig.fromMap(Map(
      "spark.cdm.connect.origin.path" -> "/o",
      "spark.cdm.connect.target.path" -> "/t",
      "spark.cdm.schema.origin.keyspaceTable" -> "lineitem",
      "spark.cdm.schema.origin.primaryKey" -> "a,b",
      "spark.cdm.schema.origin.column.names.to.target" -> "a:x, b:y",
      "spark.cdm.filter.cassandra.whereCondition" -> "a > 1",
      "spark.cdm.filter.cassandra.partition.min" -> "0",
      "spark.cdm.filter.cassandra.partition.max" -> "100",
      "spark.cdm.filter.java.token.percent" -> "15",
      "spark.cdm.feature.constantColumns.names" -> "t1,t2",
      "spark.cdm.feature.constantColumns.types" -> "string,int",
      "spark.cdm.feature.constantColumns.values" -> "v,7",
      "spark.cdm.feature.explodeMap.origin.name" -> "m",
      "spark.cdm.feature.extractJson.originColumn" -> "props",
      "spark.cdm.feature.extractJson.propertyMapping" -> "k:kv",
      "spark.cdm.transform.custom.writetime" -> "123",
      "spark.cdm.autocorrect.missing" -> "true",
      "spark.cdm.perfops.numParts" -> "64"
    ))
    assert(cfg.schema.primaryKey == Seq("a", "b"))
    assert(cfg.schema.renameMap == Map("a" -> "x", "b" -> "y"))
    assert(cfg.filters.tokenPercent.contains(15))
    assert(cfg.transform.constantColumns.get.names == Seq("t1", "t2"))
    assert(cfg.transform.explodeMap.get.keyName == "m_key")
    assert(cfg.transform.extractJson.get.propertyMapping == "k:kv")
    assert(cfg.transform.customWritetime.contains(123L))
    assert(cfg.autocorrect.missing && !cfg.autocorrect.mismatch)
    assert(cfg.perf.numParts.contains(64))
  }

  test("rejects unknown spark.cdm.* keys (E4 fail-fast)") {
    val conf = new org.apache.spark.SparkConf()
      .set("spark.cdm.connect.origin.path", "/o")
      .set("spark.cdm.bogus.key", "x")
    val e = intercept[IllegalArgumentException](CdmConfig.from(conf))
    assert(e.getMessage.contains("spark.cdm.bogus.key"))
  }

  test("rejects mismatched constant-column arity") {
    val e = intercept[IllegalArgumentException](CdmConfig.fromMap(Map(
      "spark.cdm.feature.constantColumns.names" -> "a,b",
      "spark.cdm.feature.constantColumns.types" -> "string",
      "spark.cdm.feature.constantColumns.values" -> "1,2")))
    assert(e.getMessage.contains("lengths differ"))
  }

  test("rejects malformed rename pairs") {
    intercept[IllegalArgumentException](CdmConfig.fromMap(Map(
      "spark.cdm.schema.origin.column.names.to.target" -> "a=b")))
  }

  test("round-trips a realistic production cdm.properties (S7/E3 parity)") {
    val cfg = CdmConfig.fromMap(Map(
      "spark.cdm.connect.origin.host" -> "10.0.0.1",
      "spark.cdm.connect.origin.port" -> "9042",
      "spark.cdm.connect.origin.username" -> "cdm_user",
      "spark.cdm.connect.origin.password" -> "s3cret",
      "spark.cdm.connect.origin.tls.enabled" -> "true",
      "spark.cdm.connect.origin.tls.trustStore.path" -> "/certs/truststore.jks",
      "spark.cdm.connect.origin.tls.trustStore.password" -> "tsp",
      "spark.cdm.connect.origin.tls.trustStore.type" -> "PKCS12",
      "spark.cdm.connect.origin.tls.enabledAlgorithms" -> "TLS_RSA_WITH_AES_256_CBC_SHA",
      "spark.cdm.connect.target.scb" -> "/astra/scb.zip",
      "spark.cdm.connect.target.username" -> "token",
      "spark.cdm.connect.target.password" -> "AstraCS:xxx",
      "spark.cdm.schema.origin.keyspaceTable" -> "ks.tbl",
      "spark.cdm.schema.origin.primaryKey" -> "pk",
      "spark.cdm.perfops.consistency.read" -> "LOCAL_ONE",
      "spark.cdm.perfops.consistency.write" -> "EACH_QUORUM"))
    assert(cfg.origin.host.contains("10.0.0.1") && cfg.origin.port.contains(9042))
    assert(cfg.origin.tls.enabled && cfg.origin.tls.trustStoreType == "PKCS12")
    assert(cfg.target.scb.contains("/astra/scb.zip") && cfg.target.host.isEmpty)
    assert(cfg.perf.consistencyRead == "LOCAL_ONE" && cfg.perf.consistencyWrite == "EACH_QUORUM")
  }

  test("loads a cdm.properties file from disk, ignoring non-cdm spark keys") {
    val f = java.nio.file.Files.createTempFile("cdm", ".properties")
    java.nio.file.Files.writeString(f,
      """# migration config
        |spark.cdm.connect.origin.path=/data/origin
        |spark.cdm.schema.origin.keyspaceTable=ks.tbl
        |spark.cdm.schema.origin.primaryKey=pk1,pk2
        |spark.cdm.perfops.numParts=64
        |spark.executor.memory=25G
        |spark.serializer=org.apache.spark.serializer.KryoSerializer
        |""".stripMargin)
    try {
      val cfg = CdmConfig.fromPropertiesFile(f.toString)
      assert(cfg.origin.path == "/data/origin")
      assert(cfg.schema.primaryKey == Seq("pk1", "pk2"))
      assert(cfg.perf.numParts.contains(64))
      // unknown spark.cdm.* keys in a FILE fail fast like the SparkConf path
      java.nio.file.Files.writeString(f, "spark.cdm.bogus.key=1\n")
      intercept[IllegalArgumentException](CdmConfig.fromPropertiesFile(f.toString))
    } finally java.nio.file.Files.delete(f)
  }

  test("rejects contradictory connection configs") {
    intercept[IllegalArgumentException](CdmConfig.fromMap(Map( // scb + host
      "spark.cdm.connect.origin.host" -> "h",
      "spark.cdm.connect.origin.scb" -> "/scb.zip")))
    intercept[IllegalArgumentException](CdmConfig.fromMap(Map( // tls w/o truststore
      "spark.cdm.connect.origin.tls.enabled" -> "true")))
  }
}

/** The wrapper's env-var rewrite engine (entrypoint.sh:88-179) as a pure
 * function. */
class EnvPropertiesSpec extends AnyFunSuite {
  import EnvProperties._

  test("CDM_PROPERTY_FOO_BAR rewrites property foo.bar") {
    assert(confKeyOf("CDM_PROPERTY_SPARK_CDM_CONNECT_ORIGIN_PATH") == "spark.cdm.connect.origin.path")
    val out = applyEnv(Map("CDM_PROPERTY_SPARK_CDM_CONNECT_ORIGIN_PATH" -> "/data/origin"))
    assert(out == Map("spark.cdm.connect.origin.path" -> "/data/origin"))
  }

  test("matches camelCase file keys case-insensitively and keeps their spelling") {
    // the derived key is all-lowercase (entrypoint.sh:133); the stock file
    // spells it spark.cdm.schema.origin.keyspaceTable
    val out = applyEnv(Map("CDM_PROPERTY_SPARK_CDM_SCHEMA_ORIGIN_KEYSPACETABLE" -> "ks.tbl"))
    assert(out == Map("spark.cdm.schema.origin.keyspaceTable" -> "ks.tbl"))
  }

  test("env: indirection resolves through the environment (entrypoint.sh:137-141)") {
    val out = applyEnv(Map(
      "CDM_PROPERTY_SPARK_CDM_CONNECT_ORIGIN_PASSWORD" -> "env:ORIGIN_PW",
      "ORIGIN_PW" -> "hunter2"))
    assert(out("spark.cdm.connect.origin.password") == "hunter2")
    val e = intercept[IllegalArgumentException](applyEnv(Map(
      "CDM_PROPERTY_SPARK_CDM_CONNECT_ORIGIN_PASSWORD" -> "env:MISSING_VAR")))
    assert(e.getMessage.contains("MISSING_VAR"))
  }

  test("unknown properties are rejected (entrypoint.sh:146-149)") {
    val e = intercept[IllegalArgumentException](applyEnv(Map(
      "CDM_PROPERTY_SPARK_CDM_NO_SUCH_PROP" -> "x")))
    assert(e.getMessage.contains("Unable to find property spark.cdm.no.such.prop"))
  }

  test("updates active values and enables commented ones") {
    val tpl = PropertiesTemplate(
      values = Map("spark.cdm.perfops.batchSize" -> "5"),
      disabled = Set("spark.cdm.perfops.numParts"))
    val out = applyEnv(Map(
      "CDM_PROPERTY_SPARK_CDM_PERFOPS_BATCHSIZE" -> "10",
      "CDM_PROPERTY_SPARK_CDM_PERFOPS_NUMPARTS" -> "64"), tpl)
    assert(out == Map("spark.cdm.perfops.batchSize" -> "10", "spark.cdm.perfops.numParts" -> "64"))
  }

  test("credentials documents fill username/password, explicit env wins") {
    val env = applyCredentials(
      Map("CDM_PROPERTY_SPARK_CDM_CONNECT_ORIGIN_USERNAME" -> "from_env"),
      originCreds = Map("username" -> "from_file", "password" -> "pw_o"),
      targetCreds = Map("username" -> "t_user", "password" -> "pw_t"))
    val out = applyEnv(env)
    assert(out("spark.cdm.connect.origin.username") == "from_env") // env wins
    assert(out("spark.cdm.connect.origin.password") == "pw_o")
    assert(out("spark.cdm.connect.target.username") == "t_user")
  }

  test("the same engine rewrites log4j config under the CDM_LOGGING_ prefix (entrypoint.sh:186)") {
    val tpl = PropertiesTemplate(
      values = Map("log4j.rootLogger" -> "INFO, stdout"),
      disabled = Set("log4j.logger.com.datastax"))
    val out = applyEnv(
      Map(
        "CDM_LOGGING_LOG4J_ROOTLOGGER" -> "DEBUG, stdout",
        "CDM_LOGGING_LOG4J_LOGGER_COM_DATASTAX" -> "TRACE",
        "CDM_PROPERTY_SPARK_CDM_PERFOPS_NUMPARTS" -> "8"), // different prefix: ignored here
      tpl, prefix = "CDM_LOGGING_")
    assert(out == Map(
      "log4j.rootLogger" -> "DEBUG, stdout",
      "log4j.logger.com.datastax" -> "TRACE"))
  }

  test("=-delimiter line rewrite: enable, update, spacing preserved, bare-key quirk (entrypoint.sh:160-174)") {
    val file = Seq(
      "# Set everything to be logged to the console",
      "#log4j.rootCategory=INFO, console",
      "log4j.appender.console.target = System.err",
      "log4j.logger.org.apache.spark")
    val out = rewriteFileLines(file, Map(
      // commented key: enabled, file's camelCase spelling kept, '=' kept
      "CDM_LOGGING_LOG4J_ROOTCATEGORY" -> "DEBUG,console",
      // active key: updated, the original ' = ' span preserved verbatim
      "CDM_LOGGING_LOG4J_APPENDER_CONSOLE_TARGET" -> "System.out",
      // bare key with no delimiter at all: value appended after four
      // spaces, even in '=' mode — the wrapper's no-value branch
      "CDM_LOGGING_LOG4J_LOGGER_ORG_APACHE_SPARK" -> "WARN"))
    assert(out == Seq(
      "# Set everything to be logged to the console",
      "log4j.rootCategory=DEBUG,console",
      "log4j.appender.console.target = System.out",
      "log4j.logger.org.apache.spark    WARN"))
  }

  test("=-delimiter line rewrite: env: indirection and missing-key hard error") {
    val file = Seq("#log4j.rootCategory=INFO")
    val out = rewriteFileLines(file,
      Map("CDM_LOGGING_LOG4J_ROOTCATEGORY" -> "env:LOG_LEVEL", "LOG_LEVEL" -> "TRACE"))
    assert(out == Seq("log4j.rootCategory=TRACE"))
    val e = intercept[IllegalArgumentException](
      rewriteFileLines(file, Map("CDM_LOGGING_LOG4J_NOPE" -> "x")))
    assert(e.getMessage.contains("Unable to find property log4j.nope"))
    // a key that's only a PREFIX of a file key must not match: the regex
    // requires the delimiter (or end-of-line) right after the key
    val e2 = intercept[IllegalArgumentException](
      rewriteFileLines(Seq("log4j.rootCategoryExtra=INFO"),
        Map("CDM_LOGGING_LOG4J_ROOTCATEGORY" -> "x")))
    assert(e2.getMessage.contains("log4j.rootcategory"))
  }

  test("=-delimiter rewrite touches EVERY matching line, like the wrapper's sed") {
    // sed -i has no line address (entrypoint.sh:174): a commented early
    // definition AND a later active one are both rewritten. First-line-only
    // would leave the active line overriding the new value under log4j's
    // last-definition-wins.
    val file = Seq(
      "#log4j.rootCategory=INFO, console",
      "log4j.appender.console.target = System.err",
      "log4j.rootCategory=WARN")
    val out = rewriteFileLines(file, Map("CDM_LOGGING_LOG4J_ROOTCATEGORY" -> "DEBUG,console"))
    assert(out == Seq(
      "log4j.rootCategory=DEBUG,console",
      "log4j.appender.console.target = System.err",
      "log4j.rootCategory=DEBUG,console"))
  }

  test("whitespace mode rewrites space-delimited lines (the cdm.properties file shape)") {
    val file = Seq("spark.cdm.perfops.numParts    5000", "#spark.cdm.perfops.batchSize  5")
    val out = rewriteFileLines(file, Map(
        "CDM_PROPERTY_SPARK_CDM_PERFOPS_NUMPARTS" -> "32",
        "CDM_PROPERTY_SPARK_CDM_PERFOPS_BATCHSIZE" -> "10"),
      prefix = DefaultPrefix, delimiter = None)
    assert(out == Seq("spark.cdm.perfops.numParts    32", "spark.cdm.perfops.batchSize  10"))
  }

  test("end-to-end: env → properties → typed CdmConfig") {
    val cfg = configFromEnv(Map(
      "CDM_PROPERTY_SPARK_CDM_CONNECT_ORIGIN_PATH" -> "/o",
      "CDM_PROPERTY_SPARK_CDM_SCHEMA_ORIGIN_KEYSPACETABLE" -> "lineitem",
      "CDM_PROPERTY_SPARK_CDM_SCHEMA_ORIGIN_PRIMARYKEY" -> "a,b",
      "CDM_PROPERTY_SPARK_CDM_PERFOPS_NUMPARTS" -> "32"))
    assert(cfg.origin.path == "/o")
    assert(cfg.schema.table == "lineitem")
    assert(cfg.schema.primaryKey == Seq("a", "b"))
    assert(cfg.perf.numParts.contains(32))
  }
}
