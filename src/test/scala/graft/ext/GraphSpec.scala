package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics pins for the fixed-point PageRank: exact hand-computed
 * values, partitioning invariance (the reason it IS fixed-point), mass
 * conservation bounds, and the ordering a curation pipeline consumes. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  test("symmetric 2-cycle is a fixed point: ranks stay exactly scale/N") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Graph.pageRankFixed(edges, "src", "dst", iters = 5)
      .as[(Long, Long)].collect().toMap
    // init = 5e11; teleport + 85% of a full contribution = 7.5e10 +
    // 4.25e11 = 5e11 again, exactly, every round
    assert(r === Map(1L -> 500000000000L, 2L -> 500000000000L))
  }

  test("hand-computed asymmetric triangle after one round") {
    // a→b, a→c, b→a, c→a: N=3, init=333333333333, teleport=49999999999
    // (integer steps: init*15 div 100 with init = 1e12 div 3)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 0L), (2L, 0L)).toDF("src", "dst")
    val init = Scale / 3
    val teleport = (init * 15L) / 100L
    // round 1: a receives b and c whole: teleport + 85*(2*init) div 100
    // b, c each receive half of a: teleport + 85*(init div 2) div 100
    val expA = teleport + (85L * (2L * init)) / 100L
    val expBC = teleport + (85L * (init / 2L)) / 100L
    val r = Graph.pageRankFixed(edges, "src", "dst", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r(0L) === expA && r(1L) === expBC && r(2L) === expBC)
  }

  test("partitioning-invariant bit-for-bit (the fixed-point claim)") {
    val e0 = graft.io.TableIO.read(spark, Sf, "lineitem")
      .select((col("l_partkey") * 2).cast("long").as("src"),
        (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
      .distinct()
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val a = Graph.pageRankFixed(edges, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().sorted.toSeq
    val b = Graph.pageRankFixed(edges.repartition(7), "src", "dst", iters = 3)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(a === b && a.nonEmpty)
  }

  test("personalized: teleport lands only on seeds; unreachable non-seeds stay at zero") {
    // 1 → 2 → 3, plus isolated-from-seeds node 4 → 5; seed = {1}
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val r = Graph.pageRankPersonalized(edges, "src", "dst",
        seedPred = n => n === 1L, iters = 5)
      .as[(Long, Long)].collect().toMap
    // nodes 4 and 5 are unreachable from the seed: no teleport, no
    // inbound seeded mass → exactly zero, the personalization contract
    assert(r(4L) === 0L && r(5L) === 0L)
    assert(r(1L) > 0L && r(2L) > 0L && r(3L) > 0L)
    // the seed re-receives teleport every round: it outranks its chain
    assert(r(1L) > r(2L) && r(2L) > r(3L))
  }

  test("personalized equals uniform when every node is a seed") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val uniform = Graph.pageRankFixed(edges, "src", "dst", iters = 4)
      .as[(Long, Long)].collect().toMap
    val allSeeds = Graph.pageRankPersonalized(edges, "src", "dst",
        seedPred = _ => lit(true), iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(uniform === allSeeds)
  }

  test("mass is conserved up to truncation loss; hub outranks leaves") {
    // 5 leaves all pointing at a hub; hub points back at leaf 1
    val edges = ((1L to 5L).map(x => (x, 99L)) :+ (99L, 1L)).toDF("src", "dst")
    val r = Graph.pageRankFixed(edges, "src", "dst", iters = 5)
      .as[(Long, Long)].collect().toMap
    val total = r.values.sum
    // every unit lost is integer-division truncation: strictly bounded
    // above by scale, and the loss stays small (< 20% over 5 rounds even
    // with leaves 2..5 receiving teleport-only mass)
    assert(total <= Scale && total >= Scale * 4 / 5 - 6L)
    assert(r(99L) > r(1L) && r(1L) > r(2L) && r(2L) === r(5L))
  }

  test("small-graph local path is bit-identical to the distributed rounds on random graphs") {
    // localMaxEdges = 0 forces the distributed path; default takes the
    // local loop — both must agree to the last picorank unit on random
    // graphs (duplicate edges, dangling nodes, self-loops, hubs) and for
    // both the uniform and personalized faces
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 4) {
      val n = 10 + rnd.nextInt(40)
      val m = 20 + rnd.nextInt(200)
      val es = (1 to m).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val edges = es.toDF("src", "dst")
      val local = Graph.pageRankFixed(edges, "src", "dst", iters = 4)
        .as[(Long, Long)].collect().toMap
      val dist = Graph.pageRankFixed(edges, "src", "dst", iters = 4, localMaxEdges = 0L)
        .as[(Long, Long)].collect().toMap
      assert(local === dist, s"trial $trial uniform diverged")
      val localP = Graph.pageRankPersonalized(edges, "src", "dst",
          seedPred = node => node % 3 === 0, iters = 4)
        .as[(Long, Long)].collect().toMap
      val distP = Graph.pageRankPersonalized(edges, "src", "dst",
          seedPred = node => node % 3 === 0, iters = 4, localMaxEdges = 0L)
        .as[(Long, Long)].collect().toMap
      assert(localP === distP, s"trial $trial personalized diverged")
    }
  }

  test("null endpoints: local-path gate falls through to the distributed form (no NPE)") {
    // null is a legal node key in the distributed path (Column semantics
    // group it); the local arrays unbox primitives and would NPE — the
    // gate must detect the null in the probe and take the distributed
    // path, returning the same ranks either way
    val edges = Seq[(Option[Long], Option[Long])](
      (Some(1L), Some(2L)), (Some(2L), Some(1L)), (None, Some(1L)), (Some(2L), None))
      .toDF("src", "dst")
    val viaGate = Graph.pageRankFixed(edges, "src", "dst", iters = 3)
      .collect().map(r => (Option(r.get(0)), r.getLong(1))).toMap
    val dist = Graph.pageRankFixed(edges, "src", "dst", iters = 3, localMaxEdges = 0L)
      .collect().map(r => (Option(r.get(0)), r.getLong(1))).toMap
    assert(viaGate === dist, "gated path diverged from the distributed form on null endpoints")
    assert(viaGate.contains(None), "null node lost")
  }
}
