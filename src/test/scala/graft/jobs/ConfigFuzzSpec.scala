package graft.jobs

import graft.SparkSpec
import graft.config.CdmConfig
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Differential fuzzing of the CONFIG-DRIVEN pipeline (SURVEY §5.2 taken to
 * the job level): the engine's real surface is (properties-file × job),
 * so the property under test is the whole Migrate pipeline — random valid
 * `CdmConfig`s over ten interacting features (where-filter, writetime
 * window, column-value skip, null-PK skip, column skip, rename, constant
 * columns, explode-map, map scrub, INT_STRING codec) run through
 * `Migrate.plan` and are compared against an INDEPENDENT sequential
 * interpreter of the reference semantics (plain Scala over the generated
 * rows — no Spark, no shared code with the engine). A mismatch in any
 * combination means two code paths disagree about what the properties
 * mean; every hand-written query being green can't catch that, because
 * hand-written queries only visit hand-picked combinations.
 *
 * Deterministic: ScalaCheck Seed(42) for the data, an LCG over the combo
 * index for the config lattice sample.
 */
class ConfigFuzzSpec extends SparkSpec {

  // ---- generated origin table ---------------------------------------------

  /** One origin row; None = SQL NULL. Map values may be None (CQL nulls
   * inside collections — what map scrub exists for). */
  private case class R(
      id: Option[Long], ck: Option[Int], qty: Option[Int],
      name: Option[String], m: Map[String, Option[Int]], wt: Option[Long],
      jv: Option[Int]) // embedded {"k": jv} JSON payload; None = null props

  private val WtThreshold = 1000000L // µs writetime-window lower bound

  private def genRows: List[R] = {
    val g = for {
      id <- Gen.option(Gen.chooseNum(0L, 80L)) // dup keys + nulls both likely
      ck <- Gen.frequency(9 -> Gen.chooseNum(0, 4).map(Some(_)), 1 -> Gen.const(None))
      qty <- Gen.option(Gen.chooseNum(-5, 99))
      name <- Gen.frequency(
        3 -> Gen.oneOf("alpha", "beta", "drop_me").map(Some(_)),
        1 -> Gen.const(None))
      mSize <- Gen.chooseNum(0, 3)
      keys <- Gen.listOfN(mSize, Gen.oneOf("k1", "k2", "k3", "k4"))
      vals <- Gen.listOfN(mSize, Gen.option(Gen.chooseNum(0, 9)))
      wt <- Gen.option(Gen.chooseNum(WtThreshold - 5L, WtThreshold + 5L))
      jv <- Gen.option(Gen.chooseNum(0, 999))
    } yield R(id, ck, qty, name, keys.zip(vals).toMap, wt, jv)
    Gen.listOfN(260, g).apply(Gen.Parameters.default, Seed(42L)).get
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("ck", IntegerType),
    StructField("qty", IntegerType), StructField("name", StringType),
    StructField("m", MapType(StringType, IntegerType, valueContainsNull = true)),
    StructField("wt_name", LongType), StructField("props", StringType)))

  // ---- the independent interpreter ----------------------------------------

  /** Feature switches = one point of the config lattice. */
  private case class Combo(where: Boolean, wtWin: Boolean, colSkipVal: Boolean,
      skipQty: Boolean, rename: Boolean, const: Boolean, explode: Boolean,
      scrub: Boolean, codec: Boolean, extract: Boolean) {
    def toProps: Map[String, String] = Map(
      "spark.cdm.schema.origin.keyspaceTable" -> "fuzztab",
      "spark.cdm.schema.origin.primaryKey" -> "id,ck") ++
      (if (where) Map("spark.cdm.filter.cassandra.whereCondition" -> "ck >= 2") else Map.empty) ++
      (if (wtWin) Map(
        "spark.cdm.schema.origin.column.writetime.names" -> "wt_name",
        "spark.cdm.filter.java.writetime.min" -> WtThreshold.toString) else Map.empty) ++
      (if (colSkipVal) Map(
        "spark.cdm.filter.java.column.name" -> "name",
        "spark.cdm.filter.java.column.value" -> "drop_me") else Map.empty) ++
      (if (skipQty) Map("spark.cdm.schema.origin.column.skip" -> "qty") else Map.empty) ++
      (if (rename) Map("spark.cdm.schema.origin.column.names.to.target" -> "name:label") else Map.empty) ++
      (if (const) Map(
        "spark.cdm.feature.constantColumns.names" -> "c_tenant",
        "spark.cdm.feature.constantColumns.types" -> "int",
        "spark.cdm.feature.constantColumns.values" -> "7") else Map.empty) ++
      (if (explode) Map(
        "spark.cdm.feature.explodeMap.origin.name" -> "m",
        "spark.cdm.feature.explodeMap.target.name.key" -> "m_key",
        "spark.cdm.feature.explodeMap.target.name.value" -> "m_value") else Map.empty) ++
      (if (scrub) Map("spark.cdm.transform.map.remove.null.value" -> "true") else Map.empty) ++
      (if (codec) Map("spark.cdm.transform.codecs" -> "INT_STRING") else Map.empty) ++
      (if (extract) Map(
        "spark.cdm.feature.extractJson.originColumn" -> "props",
        "spark.cdm.feature.extractJson.propertyMapping" -> "k:kval") else Map.empty)
  }

  private val Null = "␀" // canonical NULL marker for row comparison

  /** Reference semantics, sequentially, straight from SURVEY §3.1 pipeline
   * order: writetime companion → filters (where → writetime window →
   * column-value → null-PK) → projection (skip, rename) → transforms
   * (constants → explode → map scrub → codecs). Returns (column names,
   * multiset of canonical rows). */
  /** Expected column name -> Spark dtype simpleString. The canonical row
   * strings cannot distinguish int 7 from string "7", so the INT_STRING
   * codec's effect is asserted via the dtype map instead. */
  private def expectedTypes(c: Combo): Map[String, String] = {
    val intT = if (c.codec) "string" else "int"
    Map("id" -> "bigint", "ck" -> "int", "qty" -> intT,
      (if (c.rename) "label" else "name") -> "string",
      "m" -> "map<string,int>", "wt_name" -> "bigint", "props" -> "string",
      "row_writetime" -> "bigint", "c_tenant" -> intT,
      "m_key" -> "string", "m_value" -> intT, "kval" -> "string")
  }

  private def interpret(rows: List[R], c: Combo): (Seq[String], Map[Seq[String], Int]) = {
    // filters (pre-rename names)
    var kept = rows
    if (c.where) kept = kept.filter(_.ck.exists(_ >= 2))
    if (c.wtWin) kept = kept.filter(_.wt.exists(_ >= WtThreshold))
    if (c.colSkipVal) kept = kept.filter(!_.name.contains("drop_me"))
    kept = kept.filter(r => r.id.isDefined && r.ck.isDefined) // null-PK skip

    val nameCol = if (c.rename) "label" else "name"
    // column order mirrors the engine's structural order: base columns
    // (minus skips, renamed in place), row_writetime appended by the
    // companion step, constants appended, explode consumes `m` in place
    // and emits key/value at the end
    val cols = Seq("id", "ck") ++ (if (c.skipQty) Nil else Seq("qty")) ++ Seq(nameCol) ++
      (if (c.explode) Nil else Seq("m")) ++ Seq("wt_name", "props") ++
      (if (c.wtWin) Seq("row_writetime") else Nil) ++
      (if (c.const) Seq("c_tenant") else Nil) ++
      (if (c.explode) Seq("m_key", "m_value") else Nil) ++
      (if (c.extract) Seq("kval") else Nil)

    def str(o: Option[Any]): String = o.map(_.toString).getOrElse(Null)
    def mapStr(m: Map[String, Option[Int]]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=${str(v)}" }.mkString("{", ",", "}")

    val out = kept.flatMap { r =>
      // scrub acts on the map only while it IS still a map column; when
      // explode is also on, explode consumed it first (pipeline order) and
      // the scrub is a structural no-op
      val m = if (c.scrub && !c.explode) r.m.filter(_._2.isDefined) else r.m
      val props = r.jv.map(v => s"""{"k": $v}""")
      val base: Seq[String] = List(str(r.id), str(r.ck)) ++
        (if (c.skipQty) Nil else Seq(str(r.qty))) ++ Seq(str(r.name)) ++
        (if (c.explode) Nil else Seq(mapStr(m))) ++ Seq(str(r.wt), str(props)) ++
        (if (c.wtWin) Seq(str(r.wt)) else Nil) ++ // row_writetime = greatest(wt_name)
        (if (c.const) Seq("7") else Nil)
      val rows0 =
        if (!c.explode) Seq(base)
        else r.m.toSeq.map { case (k, v) => base ++ Seq(k, str(v)) } // empty map → row dropped
      rows0.map(b => if (c.extract) b ++ Seq(str(r.jv)) else b) // get_json_object → string
    }
    (cols, out.groupBy(identity).map { case (k, v) => k -> v.size })
  }

  // ---- the differential run -----------------------------------------------

  test("random configs over 10 interacting features: Migrate.plan equals the sequential interpreter") {
    val rows = genRows
    val originDir = java.nio.file.Files.createTempDirectory("fuzz-origin").toString
    val sparkRows = rows.map(r => Row(
      r.id.map(Long.box).orNull, r.ck.map(Int.box).orNull, r.qty.map(Int.box).orNull,
      r.name.orNull, r.m.map { case (k, v) => k -> v.map(Int.box).orNull }, r.wt.map(Long.box).orNull,
      r.jv.map(v => s"""{"k": $v}""").orNull))
    spark.createDataFrame(spark.sparkContext.parallelize(sparkRows, 4), schema)
      .write.mode("overwrite").parquet(s"$originDir/fuzztab.parquet")

    // lattice sample: all-off, all-on, each single feature, plus 24
    // LCG-drawn combos — 35 configurations, deterministic
    def fromBits(b: Int) = Combo((b & 1) != 0, (b & 2) != 0, (b & 4) != 0, (b & 8) != 0,
      (b & 16) != 0, (b & 32) != 0, (b & 64) != 0, (b & 128) != 0, (b & 256) != 0,
      (b & 512) != 0)
    val corners = Seq(0, 1023) ++ (0 until 10).map(1 << _)
    val lcg = Iterator.iterate(12345L)(s => (s * 1103515245L + 12345L) & 0x7fffffffL)
      .drop(1).map(s => (s % 1024).toInt).take(28).toSeq
    val combos = (corners ++ lcg).distinct.map(fromBits)

    combos.foreach { combo =>
      val cfg = CdmConfig.fromMap(combo.toProps +
        ("spark.cdm.connect.origin.path" -> originDir))
      val df = Migrate.plan(spark, cfg)
      val (expCols, expRows) = interpret(rows, combo)
      assert(df.columns.toSeq == expCols, s"column mismatch for $combo")
      val types = expectedTypes(combo)
      df.schema.fields.foreach(f =>
        assert(f.dataType.simpleString == types(f.name),
          s"dtype mismatch for $combo: ${f.name} is ${f.dataType.simpleString}, want ${types(f.name)}"))
      def canon(v: Any): String = v match {
        case null => Null
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
          .map { case (k, x) => s"$k=${if (x == null) Null else x.toString}" }
          .mkString("{", ",", "}")
        case other => other.toString
      }
      val got = df.collect().toSeq
        .map(r => (0 until r.length).map(i => canon(r.get(i))).toList: Seq[String])
        .groupBy(identity).map { case (k, v) => k -> v.size }
      assert(got == expRows,
        s"row mismatch for $combo: ${got.size} distinct vs ${expRows.size} expected; " +
          s"sample diff got=${(got.keySet -- expRows.keySet).take(2)} " +
          s"exp=${(expRows.keySet -- got.keySet).take(2)}")
    }
  }
}
