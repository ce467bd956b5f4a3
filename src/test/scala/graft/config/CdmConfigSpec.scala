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
}
