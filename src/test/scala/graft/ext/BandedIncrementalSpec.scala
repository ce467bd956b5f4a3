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

  test("SYMMETRIC fixture split: incremental == rebuild, several geometries") {
    val emb = TableIO.read(spark, Sf, "embeddings")
    val base = emb.filter(col("vec_id") % 5 =!= 4)
    val delta = emb.filter(col("vec_id") % 5 === 4)
    for ((bands, planes, probes) <- Seq((2, 3, 1), (3, 4, 2), (2, 4, 4))) {
      // symmetric state = the per-band survivor lists (post-heap design)
      val state = Similarity.bandSurvivors(base, 4, bands, planes, probes = probes)
      val inc = Similarity.knnDirectedBandedIncremental(base, delta, state,
        4, bands, planes, probes = probes, symmetric = true)
      val rebuild = Similarity.knnDirectedBanded(emb, 4, bands, planes,
        probes = probes, symmetric = true)
      assert(sortedEdges(inc) == sortedEdges(rebuild),
        s"sym diverged at bands=$bands planes=$planes probes=$probes")
    }
  }

  test("SYMMETRIC multi-batch fold: state carried across two ingests == rebuild") {
    val emb = TableIO.read(spark, Sf, "embeddings")
    val b0 = emb.filter(col("vec_id") % 5 < 3)
    val d1 = emb.filter(col("vec_id") % 5 === 3)
    val d2 = emb.filter(col("vec_id") % 5 === 4)
    // the symmetric FOLDABLE state is the survivor table; the directed
    // graph is derived from it after each fold
    val s0 = Similarity.bandSurvivors(b0, 4, bands = 2, bandPlanes = 3, probes = 2)
    val s1 = Similarity.bandSurvivorsIncremental(b0, d1, s0,
      4, bands = 2, bandPlanes = 3, probes = 2).localCheckpoint()
    assert(sortedEdges(Similarity.directedFromSurvivors(s1, 4))
        == sortedEdges(Similarity.knnDirectedBanded(
        b0.union(d1), 4, bands = 2, bandPlanes = 3, probes = 2, symmetric = true)),
      "sym fold diverged after batch 1")
    val s2 = Similarity.bandSurvivorsIncremental(b0.union(d1), d2, s1,
      4, bands = 2, bandPlanes = 3, probes = 2)
    assert(sortedEdges(Similarity.directedFromSurvivors(s2, 4))
        == sortedEdges(Similarity.knnDirectedBanded(
        emb, 4, bands = 2, bandPlanes = 3, probes = 2, symmetric = true)),
      "sym fold diverged after batch 2")
    // the survivor state itself folds rebuild-equal, frame for frame
    val svRows = (df: org.apache.spark.sql.DataFrame) =>
      df.select("query_id", "band", "vec_id", "cos6").collect()
        .map(_.toString).toSeq.sorted
    assert(svRows(s2) == svRows(Similarity.bandSurvivors(
        emb, 4, bands = 2, bandPlanes = 3, probes = 2)),
      "survivor state diverged from the rebuild")
  }

  test("SYMMETRIC reverse-only affected: a base query none of whose probed buckets are touched still recomputes") {
    // reverse discovery: a delta vector PROBES a base vector's true
    // bucket while the base vector probes no delta-true bucket — its
    // survivor LIST is untouched but its DIRECTED edges change through
    // the reversal face. In the post-heap design this is handled by
    // derivation (directedFromSurvivors recomputes the slim merge over
    // the whole survivor table), not by a widened affected set; the
    // fired check scans the fixture for such a query whose edge set
    // actually changed and pins that the incremental still matches.
    // SPARSE buckets (planes >= 5 -> >= 32 buckets/band) and a SMALL
    // delta (4%), so most buckets stay untouched and reverse-only
    // affected queries can exist at all — at dense geometries the delta
    // touches nearly every bucket and A1 swallows the scenario
    val emb = TableIO.read(spark, Sf, "embeddings")
    val base = emb.filter(col("vec_id") % 25 =!= 24)
    val delta = emb.filter(col("vec_id") % 25 === 24)
    val fired = Seq((2, 5, 2), (3, 5, 2), (2, 6, 2), (2, 6, 4)).exists {
      case (bands, planes, probes) =>
        def melt(df: DataFrame) = df.select(col("vec_id"),
            posexplode(org.apache.spark.sql.graft.FloatVectorDot.lshBandProbes(
              col("embedding"), bands, planes, probes)).as(Seq("band", "__pb")))
          .withColumn("bucket", element_at(col("__pb"), 1))
        val mb = melt(base).localCheckpoint(eager = false)
        val md = melt(delta).localCheckpoint(eager = false)
        val touched = md.select("band", "bucket").distinct()
        val a1 = mb.select(col("vec_id"), col("band"), explode(col("__pb")).as("bucket"))
          .join(touched, Seq("band", "bucket"))
          .select("vec_id").distinct()
          .collect().map(_.getLong(0)).toSet
        val state = Similarity.bandSurvivors(base, 4, bands, planes, probes = probes)
        val rebuild = Similarity.knnDirectedBanded(base.union(delta), 4, bands, planes,
          probes = probes, symmetric = true)
        val stateDirected = Similarity.directedFromSurvivors(state, 4)
        val stateBy = sortedEdges(stateDirected).groupBy(_._1)
        val rebuildBy = sortedEdges(rebuild).groupBy(_._1)
        val baseIds = base.select("vec_id").collect().map(_.getLong(0)).toSet
        val changedOutsideA1 = baseIds.exists(q =>
          !a1.contains(q) && stateBy.get(q) != rebuildBy.get(q))
        if (changedOutsideA1) {
          // and the incremental must still match the rebuild here
          val inc = Similarity.knnDirectedBandedIncremental(base, delta, state,
            4, bands, planes, probes = probes, symmetric = true)
          assert(sortedEdges(inc) == sortedEdges(rebuild),
            s"sym reverse-only case diverged at bands=$bands planes=$planes probes=$probes")
        }
        changedOutsideA1
    }
    assert(fired,
      "no geometry produced a reverse-only affected query — the reversal face went untested")
  }

  test("SYMMETRIC cap flip: duplicate cluster over cap under symmetric discovery") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    def vec(seed: Int): Seq[java.lang.Float] =
      (0 until Similarity.VecDim).map(i =>
        java.lang.Float.valueOf(Similarity.planeComponent(seed, i) / 200.0f))
    val dup = vec(5)
    val baseRows = Seq(100L, 101L, 102L).map(i => Row(i, dup.asJava)) ++
      Seq(110L, 111L, 112L).map(i => Row(i, vec(i.toInt).asJava))
    val deltaRows = Seq(1L, 2L).map(i => Row(i, dup.asJava))
    val base = spark.createDataFrame(baseRows.asJava, schema)
    val delta = spark.createDataFrame(deltaRows.asJava, schema)
    val state = Similarity.bandSurvivors(base, 2, bands = 2, bandPlanes = 5,
      bucketCap = 3L, probes = 2)
    val inc = Similarity.knnDirectedBandedIncremental(base, delta, state,
      2, bands = 2, bandPlanes = 5, bucketCap = 3L, probes = 2, symmetric = true)
    val rebuild = Similarity.knnDirectedBanded(base.union(delta),
      2, bands = 2, bandPlanes = 5, bucketCap = 3L, probes = 2, symmetric = true)
    assert(sortedEdges(inc) == sortedEdges(rebuild), "sym cap-flip edges diverged")
    val dupIds = Set(100L, 101L, 102L, 1L, 2L)
    assert(sortedEdges(Similarity.directedFromSurvivors(state, 2))
        .exists(e => dupIds(e._1) && dupIds(e._2)),
      "state should hold intra-cluster edges before the flip")
    assert(!sortedEdges(rebuild).exists(e => dupIds(e._1) && dupIds(e._2)),
      "rebuild should drop intra-cluster edges once the bucket is over cap")
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
