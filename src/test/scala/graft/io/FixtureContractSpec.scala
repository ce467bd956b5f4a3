package graft.io

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Pins the schema contract `TableIO.read` and every query assume of the
 * driver-generated fixtures. The fixtures are regenerated between rounds
 * and their physical types have drifted before (events.ts was parquet
 * TIMESTAMP(NANOS), then `timestamp[us]` with no timezone → TIMESTAMP_NTZ,
 * which silently broke 11 queries in round 7). This spec makes the NEXT
 * drift fail one named test with a message naming the drifted column,
 * instead of scattering runtime errors across the query surface.
 *
 * What is pinned is the POST-TableIO.read logical schema — the contract
 * operators actually code against — not the raw parquet physical type
 * (TableIO.read is the normalization seam and may accept several physical
 * shapes for the same logical contract). */
class FixtureContractSpec extends SparkSpec {

  private def assertCols(table: String, expected: (String, DataType)*): Unit = {
    val df = TableIO.read(spark, Sf, table)
    val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
    expected.foreach { case (name, dt) =>
      assert(actual.contains(name),
        s"fixture drift: $table is missing column '$name' — present: ${actual.keys.toSeq.sorted.mkString(", ")}")
      assert(actual(name) == dt,
        s"fixture drift: $table.$name is ${actual(name)} after TableIO.read, engine contract expects $dt " +
          s"(if the driver regenerated the fixtures with a new physical type, extend the TableIO.read normalization seam)")
    }
  }

  test("events.ts normalizes to instant TimestampType (the event-time contract)") {
    // The one column with a normalization seam: whatever the parquet
    // physically stores (nanos long / NTZ / instant), consumers must see
    // a µs instant TimestampType or every unix_micros/window call throws.
    assertCols("events",
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
  }

  test("lineitem/orders key and measure types match the contract") {
    // The date columns are pinned as NTZ deliberately: queries and their
    // DuckDB oracles both treat them as wall-clock values, and the
    // Verify dumps re-encode whatever type surfaces here — a regen to
    // instant-µs would silently flip the dump to timestamptz and break
    // the oracle schema compare, so it must fail HERE by name instead.
    assertCols("lineitem",
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_returnflag" -> StringType,
      "l_shipdate" -> TimestampNTZType)
    assertCols("orders",
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType)
  }

  test("documents text-pipeline columns match the contract") {
    assertCols("documents",
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
  }

  test("embeddings vectors are float arrays of dimension 64") {
    assertCols("embeddings",
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
    import org.apache.spark.sql.functions._
    val dims = TableIO.read(spark, Sf, "embeddings")
      .select(size(col("embedding")).as("d")).distinct().collect().map(_.getInt(0))
    assert(dims.toSeq == Seq(64),
      s"fixture drift: embeddings.embedding dimension(s) ${dims.mkString(",")}, contract expects exactly 64")
  }

  test("TableIO.read normalizes every known physical ts shape to identical instants") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one instant, three physical encodings — the seam must map all three
    // to the same TimestampType value under the UTC session pin
    val usEpoch = 1704067200000000L // 2024-01-01 00:00:00 UTC in µs
    def readBack(dir: String): (DataType, Long) = {
      val df = TableIO.read(spark, dir, "events")
      (df.schema("ts").dataType,
        df.select(unix_micros(col("ts"))).as[Long].head())
    }

    val instantDir = tmpDir()
    Seq(1L).toDF("event_id").select(col("event_id"),
      timestamp_micros(lit(usEpoch)).as("ts"))
      .write.parquet(s"$instantDir/events.parquet")

    val ntzDir = tmpDir()
    Seq(1L).toDF("event_id").select(col("event_id"),
      timestamp_micros(lit(usEpoch)).cast(TimestampNTZType).as("ts"))
      .write.parquet(s"$ntzDir/events.parquet")

    // legacy TIMESTAMP(NANOS) surfaces as a ns LongType under nanosAsLong
    val nanosDir = tmpDir()
    Seq(1L).toDF("event_id").select(col("event_id"),
      lit(usEpoch * 1000L).as("ts"))
      .write.parquet(s"$nanosDir/events.parquet")

    Seq("instant" -> instantDir, "ntz" -> ntzDir, "nanos-long" -> nanosDir)
      .foreach { case (shape, dir) =>
        val (dt, us) = readBack(dir)
        assert(dt == TimestampType, s"$shape shape surfaced as $dt, not TimestampType")
        assert(us == usEpoch, s"$shape shape read µs $us, expected $usEpoch")
      }
  }

  test("dimension tables match the contract") {
    assertCols("customer", "c_custkey" -> LongType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)
    assertCols("supplier", "s_suppkey" -> LongType, "s_nationkey" -> IntegerType)
    assertCols("part", "p_partkey" -> LongType, "p_size" -> IntegerType)
    assertCols("nation", "n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType)
    assertCols("region", "r_regionkey" -> IntegerType, "r_name" -> StringType)
  }
}
