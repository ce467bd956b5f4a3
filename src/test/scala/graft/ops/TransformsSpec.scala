package graft.ops

import graft.SparkSpec
import graft.config.{CdmConfig, TransformConfig}
import org.apache.spark.sql.functions._

/** T4–T8 wiring through Transforms.applyAll: every parsed knob must act
 * or fail fast — never be silently ignored. */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private val noT = TransformConfig(None, None, None, Nil, None,
    mapRemoveNullValue = false, missingKeyTsReplace = None,
    customWritetime = None, customWritetimeIncrement = 0L, customTtl = None)

  test("applyAll scrubs null values from every map column when configured") {
    val df = Seq((1L, Map("a" -> Option(10)), Map("x" -> Option.empty[Int])))
      .toDF("id", "m1", "m2")
    val out = Transforms.applyAll(df, noT.copy(mapRemoveNullValue = true))
    val row = out.select(size($"m1"), size($"m2")).as[(Int, Int)].head()
    assert(row == ((1, 0)))
  }

  test("applyAll repairs epoch-0 timestamp keys in timestamp-keyed maps") {
    val df = Seq((1L, Map(java.sql.Timestamp.from(java.time.Instant.EPOCH) -> 5)))
      .toDF("id", "m")
    val out = Transforms.applyAll(df, noT.copy(missingKeyTsReplace = Some(1700000000000000L)))
    val k = out.select(unix_micros(map_keys($"m")(0))).as[Long].head()
    assert(k == 1700000000000000L)
  }

  test("applyAll applies BIGINT_STRING codec to non-PK long columns only") {
    val df = Seq((1L, 2L, 3)).toDF("pk", "payload", "n")
    val out = Transforms.applyAll(df, noT.copy(codecs = Seq("BIGINT_STRING")), pkCols = Seq("pk"))
    assert(out.schema("pk").dataType.typeName == "long")
    assert(out.schema("payload").dataType.typeName == "string")
  }

  test("unknown or unsupported codecs fail fast instead of being ignored") {
    val df = Seq((1L, 2.0)).toDF("pk", "v")
    intercept[IllegalArgumentException] {
      Transforms.applyAll(df, noT.copy(codecs = Seq("DOUBLE_STRING")))
    }
    intercept[IllegalArgumentException] {
      Transforms.applyAll(df, noT.copy(codecs = Seq("NO_SUCH_CODEC")))
    }
    intercept[IllegalArgumentException] { // format codec without a format
      Transforms.applyAll(df, noT.copy(codecs = Seq("TIMESTAMP_STRING_FORMAT")))
    }
  }

  test("customWritetime increment is deterministic across partitionings") {
    val df = Seq((1L, 1), (2L, 1), (3L, 2)).toDF("pk", "ck")
    def wt(d: org.apache.spark.sql.DataFrame) =
      Transforms.customWritetime(d, 1000000L, 7L, Seq("pk", "ck"))
        .select("pk", "ck", "writetime").as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(wt(df) == wt(df.repartition(3)))
    intercept[IllegalArgumentException] {
      Transforms.customWritetime(df, 1000000L, 7L, Nil)
    }
  }

  test("skipping a primary-key column fails fast") {
    val df = Seq((1L, 2L, "x")).toDF("pk", "ck", "v")
    val schema = CdmConfig.fromMap(Map(
      "spark.cdm.schema.origin.primaryKey" -> "pk,ck",
      "spark.cdm.schema.origin.column.skip" -> "ck,v")).schema
    val e = intercept[IllegalArgumentException](Projection(df, schema))
    assert(e.getMessage.contains("ck"))
  }

  test("map-key repair survives a collision with an existing replacement key") {
    import java.sql.Timestamp
    val epoch0 = new Timestamp(0L)
    val repl = new Timestamp(1000L) // = 1_000_000 micros
    val other = new Timestamp(2000L)
    val df = Seq(
      (1L, Map(epoch0 -> "broken", repl -> "real")), // collision: real wins
      (2L, Map(epoch0 -> "a", other -> "b")), // plain rewrite
      (3L, Map(epoch0 -> "x", epoch0 -> "y"))) // scala Map collapses dup keys; single broken
      .toDF("id", "m")
    val out = graft.ops.Transforms.repairMissingMapKeyTs(df, "m", 1000000L)
      .orderBy("id").select("m").collect()
      .map(_.getMap[Timestamp, String](0).toMap)
    assert(out(0) == Map(repl -> "real"), s"real entry must win: ${out(0)}")
    assert(out(1) == Map(repl -> "a", other -> "b"))
    assert(out(2) == Map(repl -> "x") || out(2) == Map(repl -> "y"))
  }

  test("effectivePrimaryKey extends the renamed PK with the explode key") {
    val cfg = CdmConfig.fromMap(Map(
      "spark.cdm.schema.origin.primaryKey" -> "a,b",
      "spark.cdm.schema.origin.column.names.to.target" -> "a:a2",
      "spark.cdm.feature.explodeMap.origin.name" -> "m",
      "spark.cdm.feature.explodeMap.target.name.key" -> "mk"))
    assert(cfg.effectivePrimaryKey == Seq("a2", "b", "mk"))
    intercept[IllegalArgumentException] { // key name shadowing a PK column
      CdmConfig.fromMap(Map(
        "spark.cdm.schema.origin.primaryKey" -> "a,b",
        "spark.cdm.feature.explodeMap.origin.name" -> "m",
        "spark.cdm.feature.explodeMap.target.name.key" -> "a"))
    }
  }
}
