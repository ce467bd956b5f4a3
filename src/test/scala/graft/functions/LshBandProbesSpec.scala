package graft.functions

import graft.SparkSpec
import graft.ext.Similarity
import graft.io.TableIO
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Equivalence pin for the one-pass LshBandProbes kernel against the
 * per-plane COLUMN formulation it replaced in knnDirectedBanded (the
 * bands×bandPlanes FloatVectorDot projections + bucket folds +
 * array_min/array_position argmins). The column form below is the
 * independent reference — it reconstructs the original declarative
 * expression tree verbatim, so a kernel drift in bucket bits, argmin
 * tie-breaks, or null/corrupt-vector semantics shows up as a row diff.
 */
class LshBandProbesSpec extends SparkSpec {

  import Similarity.{dot, planeComponent, VecDim}

  /** The original column formulation: per band, the true bucket and the
   * multi-probe array — exactly the expression tree knnDirectedBanded
   * built before the kernel. */
  private def columnProbes(df: DataFrame, bands: Int, bandPlanes: Int,
      probes: Int): DataFrame = {
    val allDots = for (b <- 0 until bands; j <- 0 until bandPlanes) yield {
      val plane = array((0 until VecDim).map(i =>
        lit(planeComponent(b * bandPlanes + j, i))): _*)
      dot(col("embedding"), plane).as(s"__d${b}_$j")
    }
    var cur = df.select(col("vec_id") +: col("embedding") +: allDots: _*)
    (0 until bands).foreach { b =>
      val dnames = (0 until bandPlanes).map(j => s"__d${b}_$j")
      cur = cur.withColumn(s"__bk$b",
        dnames.zipWithIndex.map { case (d, j) =>
          when(col(d) > 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _))
      cur =
        if (probes == 1) cur.withColumn(s"__pb$b", array(col(s"__bk$b")))
        else {
          val m = cur
            .withColumn(s"__mg$b", array(dnames.map(d => abs(col(d))): _*))
            .withColumn(s"__m1$b",
              (array_position(col(s"__mg$b"), array_min(col(s"__mg$b"))) - 1).cast("int"))
          if (probes == 2)
            m.withColumn(s"__pb$b", array(col(s"__bk$b"),
              expr(s"__bk$b ^ shiftleft(CAST(1 AS BIGINT), __m1$b)")))
          else
            m.withColumn(s"__mm$b", expr(
                s"""transform(sequence(0, ${bandPlanes - 1}), j ->
                   |  CASE WHEN j = __m1$b THEN CAST('Infinity' AS DOUBLE)
                   |       ELSE element_at(__mg$b, j + 1) END)""".stripMargin))
              .withColumn(s"__m2$b",
                (array_position(col(s"__mm$b"), array_min(col(s"__mm$b"))) - 1).cast("int"))
              .withColumn(s"__pb$b", expr(
                s"""array(__bk$b,
                   |  __bk$b ^ shiftleft(CAST(1 AS BIGINT), __m1$b),
                   |  __bk$b ^ shiftleft(CAST(1 AS BIGINT), __m2$b),
                   |  __bk$b ^ shiftleft(CAST(1 AS BIGINT), __m1$b)
                   |         ^ shiftleft(CAST(1 AS BIGINT), __m2$b))""".stripMargin))
        }
    }
    cur.select(col("vec_id"),
      array((0 until bands).map(b => col(s"__pb$b")): _*).as("pbs"))
  }

  private def kernelProbes(df: DataFrame, bands: Int, bandPlanes: Int,
      probes: Int): DataFrame =
    df.select(col("vec_id"),
      org.apache.spark.sql.graft.FloatVectorDot.lshBandProbes(
        col("embedding"), bands, bandPlanes, probes).as("pbs"))

  private def assertSame(df: DataFrame, bands: Int, bandPlanes: Int, probes: Int): Unit = {
    val want = columnProbes(df, bands, bandPlanes, probes)
      .orderBy("vec_id").collect().toSeq
    val got = kernelProbes(df, bands, bandPlanes, probes)
      .orderBy("vec_id").collect().toSeq
    assert(got == want,
      s"kernel diverged at bands=$bands P=$bandPlanes probes=$probes:\n" +
        got.zip(want).filter(p => p._1 != p._2).take(3)
          .map(p => s"  got ${p._1}\n want ${p._2}").mkString("\n"))
  }

  test("kernel == column formulation on fixture embeddings, probes 1/2/4") {
    val emb = TableIO.read(spark, Sf, "embeddings")
    for ((bands, planes) <- Seq((2, 3), (12, 5), (4, 8));
         probes <- Seq(1, 2, 4))
      assertSame(emb, bands, planes, probes)
  }

  test("kernel == column formulation on corrupt vectors: wrong length, null element") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def vec(seed: Int): Seq[java.lang.Float] =
      (0 until VecDim).map(i => java.lang.Float.valueOf(planeComponent(seed, i) / 100.0f))
    val rows = Seq(
      Row(1L, vec(7).asJava),                               // clean
      Row(2L, vec(9).take(10).asJava),                      // wrong length
      Row(3L, vec(11).updated(5, null: java.lang.Float).asJava), // null element
      Row(4L, (0 until VecDim).map(_ => java.lang.Float.valueOf(0f)).asJava)) // zero vector
    val df = spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = true)))))
    for (probes <- Seq(1, 2, 4)) assertSame(df, 3, 4, probes)
  }

  test("whole-null embedding: kernel yields NULL (row drops from the banded graph) — the documented divergence from the column form") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions._
    val df = spark.createDataFrame(Seq(Row(1L, null)).asJava, StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = true)))))
    val k = kernelProbes(df, 2, 3, 2).collect()
    assert(k.length == 1 && k(0).isNullAt(1), "null vector must yield a null probe set")
    // The legacy COLUMN form (lshBucketBand: a sum of CASE WHEN dot > 0
    // folds) evaluates a NULL embedding's dots to NULL, and `NULL > 0`
    // is false — so it buckets the vector at 0 and KEEPS it. The kernel's
    // drop-null is the intentional semantics for the banded graph (a
    // vector with no embedding has no meaningful bucket, and
    // knnDirectedBanded documents the drop); this pin records the
    // divergence explicitly so neither side drifts silently.
    val colForm = df.select(
      graft.ext.Similarity.lshBucketBand(col("embedding"), 0, 3).as("b")).head()
    assert(!colForm.isNullAt(0) && colForm.getLong(0) == 0L,
      "column form buckets a whole-null embedding at 0 — if this changed, " +
        "re-examine the documented kernel/column divergence")
  }
}
