package graft.functions

import graft.SparkSpec
import graft.io.TableIO
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ArgMinPair
import org.apache.spark.sql.types._

/**
 * ArgMinPair kernel pins (r18).
 *
 * 1. Equivalence with the `min(struct(dist, id))` idiom it replaced at
 *    the four Similarity argmin sites — fixture-wide on real (double,
 *    long) and (long, long) pair streams, including engineered distance
 *    TIES (the id tiebreak is part of the determinism contract).
 * 2. Aggregate-null semantics: null-dist/null-id rows are ignored; an
 *    all-null group evaluates to NULL (documented divergence from the
 *    struct form, which would rank null FIELDS first — no call site can
 *    produce them).
 * 3. The PLAN is the point: the argmin must run as HashAggregate (the
 *    struct form planned SortAggregate) — pinned so a future Spark or
 *    kernel change failing back to the sort path fails a named test.
 */
class ArgMinPairSpec extends SparkSpec {

  private def emb = TableIO.read(spark, Sf, "embeddings")

  test("argmin == min(struct) on a real (double, long) pair stream") {
    val c = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val pairs = emb.crossJoin(broadcast(c))
      .withColumn("dist6", round(
        graft.ext.Similarity.dot(col("embedding"), col("embedding"))
          - lit(2.0) * graft.ext.Similarity.dot(col("embedding"), col("c_emb"))
          + graft.ext.Similarity.dot(col("c_emb"), col("c_emb")), 6))
      .select(col("vec_id"), col("c_id"), col("dist6"))
    val viaKernel = pairs.groupBy("vec_id")
      .agg(ArgMinPair.argmin(col("dist6"), col("c_id")).as("m"))
      .select(col("vec_id"), col("m.dist").as("d"), col("m.id").as("i"))
    val viaStruct = pairs.groupBy("vec_id")
      .agg(min(struct(col("dist6"), col("c_id"))).as("m"))
      .select(col("vec_id"), col("m.dist6").as("d"), col("m.c_id").as("i"))
    assert(viaKernel.exceptAll(viaStruct).isEmpty &&
      viaStruct.exceptAll(viaKernel).isEmpty)
  }

  test("argmin breaks distance ties on the smaller id, like min(struct)") {
    val schema = StructType(Seq(
      StructField("g", LongType), StructField("d", LongType),
      StructField("i", LongType)))
    val rows = java.util.Arrays.asList(
      Row(1L, 5L, 9L), Row(1L, 5L, 3L), Row(1L, 7L, 1L), // tie at d=5 -> id 3
      Row(2L, -2L, 4L), Row(2L, -2L, 8L),                // tie at d=-2 -> id 4
      Row(3L, 0L, 0L))
    val df = spark.createDataFrame(rows, schema)
    val viaKernel = df.groupBy("g")
      .agg(ArgMinPair.argmin(col("d"), col("i")).as("m"))
      .select(col("g"), col("m.dist"), col("m.id"))
    val viaStruct = df.groupBy("g")
      .agg(min(struct(col("d"), col("i"))).as("m"))
      .select(col("g"), col("m.d"), col("m.i"))
    assert(viaKernel.exceptAll(viaStruct).isEmpty &&
      viaStruct.exceptAll(viaKernel).isEmpty)
    assert(viaKernel.orderBy("g").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((5L, 3L), (-2L, 4L), (0L, 0L)))
  }

  test("null rows are ignored; an all-null group evaluates to NULL") {
    val schema = StructType(Seq(
      StructField("g", LongType), StructField("d", LongType),
      StructField("i", LongType)))
    val rows = java.util.Arrays.asList(
      Row(1L, null, 9L), Row(1L, 4L, 7L), Row(1L, 3L, null),
      Row(2L, null, null))
    val df = spark.createDataFrame(rows, schema)
    val out = df.groupBy("g")
      .agg(ArgMinPair.argmin(col("d"), col("i")).as("m"))
      .orderBy("g").collect()
    assert(out(0).getStruct(1).getLong(0) == 4L && out(0).getStruct(1).getLong(1) == 7L)
    assert(out(1).isNullAt(1))
  }

  test("the argmin aggregate plans as HashAggregate, never SortAggregate") {
    val q = graft.ext.Similarity.assignToCentroids(emb, emb.filter(col("vec_id") < 8))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"),
      s"expected HashAggregate in:\n$plan")
    assert(!plan.contains("SortAggregate"),
      s"argmin regressed to SortAggregate:\n$plan")
  }
}
