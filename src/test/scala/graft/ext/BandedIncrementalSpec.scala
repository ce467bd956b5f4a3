package graft.ext

import graft.SparkSpec
import graft.io.TableIO
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Incremental-equals-rebuild pins for the BANDED multi-probe kNN state
 * (X36e(d)): `knnDirectedBandedIncremental(base, delta, state)` must be
 * row-equal to `knnDirectedBanded(base ∪ delta)` — on fixture splits at
 * several band geometries/probe counts, across a multi-batch FOLD
 * (state carried batch to batch), and on an engineered cap-flip where
 * the delta pushes a duplicate cluster's shared buckets over cap and
 * RESURRECTS edges the state had capped away (and vice versa drops
 * pair edges the state held).
 */
class BandedIncrementalSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.types._

  private def sortedEdges(df: DataFrame): Seq[(Long, Long, Double)] =
    df.select("src", "dst", "cos6").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted

  test("fixture split: incremental directed state == rebuild, several geometries") {
    val emb = TableIO.read(spark, Sf, "embeddings")
    val base = emb.filter(col("vec_id") % 5 =!= 4)
    val delta = emb.filter(col("vec_id") % 5 === 4)
    for ((bands, planes, probes) <- Seq((2, 3, 1), (3, 4, 2), (2, 4, 4))) {
      val state = Similarity.knnDirectedBanded(base, 4, bands, planes, probes = probes)
      val inc = Similarity.knnDirectedBandedIncremental(base, delta, state,
        4, bands, planes, probes = probes)
      val rebuild = Similarity.knnDirectedBanded(emb, 4, bands, planes, probes = probes)
      assert(sortedEdges(inc) == sortedEdges(rebuild),
        s"diverged at bands=$bands planes=$planes probes=$probes")
    }
  }

  test("multi-batch fold: state carried across two ingests == rebuild after each") {
    val emb = TableIO.read(spark, Sf, "embeddings")
    val b0 = emb.filter(col("vec_id") % 5 < 3)
    val d1 = emb.filter(col("vec_id") % 5 === 3)
    val d2 = emb.filter(col("vec_id") % 5 === 4)
    val s0 = Similarity.knnDirectedBanded(b0, 4, bands = 2, bandPlanes = 3, probes = 2)
    val s1 = Similarity.knnDirectedBandedIncremental(b0, d1, s0,
      4, bands = 2, bandPlanes = 3, probes = 2).localCheckpoint()
    assert(sortedEdges(s1) == sortedEdges(Similarity.knnDirectedBanded(
        b0.union(d1), 4, bands = 2, bandPlanes = 3, probes = 2)),
      "fold diverged after batch 1")
    val s2 = Similarity.knnDirectedBandedIncremental(b0.union(d1), d2, s1,
      4, bands = 2, bandPlanes = 3, probes = 2)
    assert(sortedEdges(s2) == sortedEdges(Similarity.knnDirectedBanded(
        emb, 4, bands = 2, bandPlanes = 3, probes = 2)),
      "fold diverged after batch 2")
  }

  test("cap flip: delta pushes a duplicate cluster over cap — edges resurrect/drop exactly") {
    // identical embeddings share EVERY band bucket; distinct background
    // vectors keep the graph non-trivial. base: 3 copies (bucket size 3
    // <= cap 3 -> the copies dominate each other's top-k); delta adds 2
    // copies -> every shared bucket goes over cap and drops whole.
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    def vec(seed: Int): Seq[java.lang.Float] =
      (0 until Similarity.VecDim).map(i =>
        java.lang.Float.valueOf(Similarity.planeComponent(seed, i) / 200.0f))
    val dup = vec(5)
    // background seeds 110-112 verified non-colliding with the cluster's
    // buckets at this geometry (seed 113 shares BOTH of its bands)
    val baseRows = Seq(100L, 101L, 102L).map(i => Row(i, dup.asJava)) ++
      Seq(110L, 111L, 112L).map(i => Row(i, vec(i.toInt).asJava))
    val deltaRows = Seq(1L, 2L).map(i => Row(i, dup.asJava))
    val base = spark.createDataFrame(baseRows.asJava, schema)
    val delta = spark.createDataFrame(deltaRows.asJava, schema)
    // bandPlanes = 5 -> 32 buckets per band, enough to isolate the
    // duplicate cluster from the four background vectors
    val state = Similarity.knnDirectedBanded(base, 2, bands = 2, bandPlanes = 5,
      bucketCap = 3L, probes = 2)
    val inc = Similarity.knnDirectedBandedIncremental(base, delta, state,
      2, bands = 2, bandPlanes = 5, bucketCap = 3L, probes = 2)
    val rebuild = Similarity.knnDirectedBanded(base.union(delta),
      2, bands = 2, bandPlanes = 5, bucketCap = 3L, probes = 2)
    assert(sortedEdges(inc) == sortedEdges(rebuild), "cap-flip edges diverged")
    // the scenario fired: the state HAS duplicate-pair edges, the union
    // must NOT (their shared buckets are over cap and dropped whole)
    val dupIds = Set(100L, 101L, 102L, 1L, 2L)
    assert(sortedEdges(state).exists(e => dupIds(e._1) && dupIds(e._2)),
      "state should hold intra-cluster edges before the flip")
    assert(!sortedEdges(rebuild).exists(e => dupIds(e._1) && dupIds(e._2)),
      "rebuild should drop intra-cluster edges once the bucket is over cap")
  }
}
