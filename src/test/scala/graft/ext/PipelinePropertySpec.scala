package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests pinning the round-6 operators against brute-force
 * Scala references on randomized inputs (fixed seed — deterministic). */
class PipelinePropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[List[A]]): List[A] =
    g.apply(Gen.Parameters.default, Seed(1337L)).get

  test("property: bloom never false-negatives across the long domain") {
    val keys = sample(Gen.listOfN(800, Gen.oneOf(
      Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.chooseNum(-100L, 100L)))).distinct
    val words = Bloom.buildWords(keys.toDF("h"), "h")
    val misses = keys.toDF("h")
      .filter(!Bloom.mightContain(words, col("h"))).count()
    assert(misses === 0L)
  }

  test("property: dupSpanStats matches a brute-force reference") {
    // small vocab forces cross-doc chunk collisions
    val vocab = Vector("a", "b", "c", "d")
    val docsGen = Gen.listOfN(40, Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab))))
    val docs = sample(docsGen).zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
    val cs = 2
    // reference: chunk = consecutive token PAIRS (exact sequences, not
    // hashes — a hash collision in the engine would show up as a diff)
    val chunksOf: Map[Long, Seq[Seq[String]]] = docs.map { case (id, text) =>
      val toks = text.split(" ").toSeq.filter(_.nonEmpty)
      id -> (if (toks.size < cs) Seq.empty[Seq[String]]
             else toks.take(toks.size / cs * cs).grouped(cs).toSeq)
    }.toMap
    val docsPerChunk: Map[Seq[String], Int] =
      chunksOf.toSeq.flatMap { case (id, chs) => chs.distinct.map(_ -> id) }
        .groupBy(_._1).map { case (ch, xs) => ch -> xs.size }
    val expected = docs.map { case (id, _) =>
      val chs = chunksOf(id)
      val dup = chs.map(docsPerChunk(_) > 1)
      val runs = dup.foldLeft(List.empty[Int]) {
        case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
        case (acc, true) => 1 :: acc
        case (acc, false) => 0 :: acc
      }
      (id, chs.size.toLong, dup.count(identity).toLong,
        (0 :: runs).max.toLong)
    }.sortBy(_._1)
    val got = Dedup.dupSpanStats(docs.toDF("doc_id", "text"), "doc_id", "text", cs)
      .orderBy("doc_id").select("doc_id", "n_chunks", "n_dup_chunks", "max_dup_run")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)
  }

  test("property: nearestInBlock matches a brute-force edit-distance reference") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rows = sample(Gen.listOfN(60, Gen.zip(
      Gen.oneOf("x", "y", "z"),
      Gen.listOfN(5, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))).zipWithIndex
      .map { case ((blk, s), i) => (i.toLong, s, blk) }
    val maxDist = 2
    val expected = rows.flatMap { case (id, s, blk) =>
      val cands = rows.filter(r => r._3 == blk && r._1 != id)
        .map(r => (r._1, r._2, lev(s, r._2)))
        .filter(_._3 <= maxDist)
      if (cands.isEmpty) None
      else {
        val best = cands.minBy(c => (c._3, c._1))
        Some((id, best._1, best._3))
      }
    }.sortBy(_._1)
    val got = Linkage.nearestInBlock(rows.toDF("id", "s", "blk"), "id", "s", Seq("blk"), maxDist)
      .orderBy("id").select("id", "match_id", "dist")
      .as[(Long, Long, Int)].collect().toSeq.map(t => (t._1, t._2, t._3))
    assert(got === expected)
  }

  test("property: crossSourceOverlap matches a brute-force census") {
    val pairs = sample(Gen.listOfN(200, Gen.zip(
      Gen.chooseNum(0, 30).map(k => s"k$k"), Gen.oneOf("s1", "s2", "s3", "s4"))))
    val expected = pairs.distinct.groupBy(_._1).toSeq
      .flatMap { case (_, ks) =>
        val srcs = ks.map(_._2).distinct.sorted
        for (i <- srcs.indices; j <- i + 1 until srcs.size) yield (srcs(i), srcs(j))
      }
      .groupBy(identity).map { case (p, xs) => (p._1, p._2, xs.size.toLong) }
      .toSeq.sortBy(p => (p._1, p._2))
    val got = Curation.crossSourceOverlap(pairs.toDF("k", "src"), col("k"), "src")
      .orderBy("src_a", "src_b").select("src_a", "src_b", "n_shared")
      .as[(String, String, Long)].collect().toSeq
    assert(got === expected)
  }

  test("property: packSequences is an exact contiguous fill for any token counts") {
    val rows = sample(Gen.listOfN(80, Gen.zip(
      Gen.oneOf("g1", "g2"), Gen.chooseNum(0L, 300L)))).zipWithIndex
      .map { case ((g, n), i) => (g, i.toLong, n) }
    val out = Curation.packSequences(rows.toDF("grp", "id", "nt"), "id", "grp", col("nt"), 100L)
      .orderBy("grp", "id")
      .select("grp", "id", "n_tokens", "start_tok", "first_seq", "n_seqs", "offset_in_seq")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    out.groupBy(_._1).foreach { case (_, rs) =>
      var cursor = 0L
      rs.sortBy(_._2).foreach { case (_, _, n, start, fs, ns, off) =>
        assert(start === cursor && fs === start / 100 && off === start % 100)
        assert(ns === (if (n > 0) (start + n - 1) / 100 - start / 100 + 1 else 1L))
        cursor += n
      }
    }
  }

  test("property: banded LSH finds engineered near-dups without drowning in false positives") {
    // The round-9 hash regression pin, as a BEHAVIOR property: on the
    // adversarial w<N> vocabulary (shared first char, digit tails — the
    // one the 2-char hash collapsed on), banded 4×2 minhash must (a)
    // recall nearly all 2-edit near-dups — expected band-agreement
    // probability 1-(1-J²)^4 ≈ 0.97 at J ≈ 0.78 — and (b) emit almost
    // no candidate pairs between unrelated documents. The old hash
    // failed BOTH here: token collisions inflated Jaccard corpus-wide,
    // flooding candidates and blowing true pairs past the bucket cap.
    val rnd = new scala.util.Random(42)
    def word() = s"w${rnd.nextInt(50000)}"
    val base = (0 until 300).map(i => i.toLong -> Seq.fill(30 + rnd.nextInt(20))(word()))
    val dups = base.take(120).map { case (id, words) =>
      val mutated = words.toArray
      mutated(rnd.nextInt(words.size)) = word()
      mutated(rnd.nextInt(words.size)) = word()
      (id + 1000L) -> mutated.toSeq
    }
    val docs = (base ++ dups).map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    val cand = Dedup.minhashPairsBanded(Dedup.withBandKeys(docs, "text"), "doc_id", bucketCap = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val truePairs = dups.map { case (dupId, _) => (dupId - 1000L, dupId) }.toSet
    val recalled = truePairs.count(cand.contains)
    assert(recalled >= (truePairs.size * 85) / 100,
      s"recalled only $recalled of ${truePairs.size} engineered near-dups")
    val falsePositives = cand -- truePairs
    assert(falsePositives.size <= 12,
      s"${falsePositives.size} candidate pairs between unrelated documents: " +
        falsePositives.take(5).mkString(", "))
  }

  test("property: local union-find CC equals both distributed loops on random graphs") {
    // random multigraphs with duplicate edges, reversed duplicates, and
    // self-loops; localMaxEdges=0 forces the distributed loops. The two
    // variants differ ONLY on self-loop-only nodes (star drops them,
    // propagation keeps them as singletons) — the local path must mirror
    // each exactly.
    val rnd = new scala.util.Random(90210L)
    for (trial <- 1 to 3) {
      val n = 15 + rnd.nextInt(50)
      val m = 10 + rnd.nextInt(120)
      val es = (1 to m).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)) ++
        Seq((n.toLong + 5, n.toLong + 5)) // a guaranteed self-loop-only node
      val pairs = es.toDF("id_a", "id_b")
      val localStar = Dedup.connectedComponentsStar(pairs, "id_a", "id_b")
        .as[(Long, Long)].collect().toSeq.sorted
      val distStar = Dedup.connectedComponentsStar(pairs, "id_a", "id_b", localMaxEdges = 0L)
        .as[(Long, Long)].collect().toSeq.sorted
      assert(localStar === distStar, s"trial $trial star diverged")
      val localProp = Dedup.connectedComponents(pairs, "id_a", "id_b")
        .as[(Long, Long)].collect().toSeq.sorted
      val distProp = Dedup.connectedComponents(pairs, "id_a", "id_b", localMaxEdges = 0L)
        .as[(Long, Long)].collect().toSeq.sorted
      assert(localProp === distProp, s"trial $trial propagation diverged")
      // the self-loop-only node: kept by propagation, dropped by star
      assert(localProp.exists(_._1 == n.toLong + 5) && !localStar.exists(_._1 == n.toLong + 5))
    }
  }

  test("property: incremental kNN graph equals a full rebuild over random corpora and splits") {
    // random embeddings + random split fraction per seed; small plane
    // count and a cap low enough that cap interactions actually occur —
    // the exactness claim (untouched buckets verbatim, touched buckets
    // whole, cap flips handled) must hold on EVERY draw, not just the
    // fixture
    val dim = Similarity.VecDim
    val rnd = new scala.util.Random(4242L)
    for (trial <- 1 to 3) {
      val n = 60 + rnd.nextInt(60)
      val splitMod = 3 + rnd.nextInt(4)
      val emb = (0L until n.toLong).map { i =>
        (i, Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
      }.toDF("vec_id", "embedding")
      val base = emb.filter($"vec_id" % splitMod =!= 0)
      val delta = emb.filter($"vec_id" % splitMod === 0)
      val planes = 3 + rnd.nextInt(3)
      val cap = 8L + rnd.nextInt(12)
      val state = Similarity.knnDirected(base, k = 3, planes = planes, bucketCap = cap)
      val inc = Similarity.knnGraphIncremental(base, delta, state,
          k = 3, planes = planes, bucketCap = cap)
        .as[(Long, Long, Double)].collect().toSeq.sorted
      val full = Similarity.knnGraphMutual(emb, k = 3, planes = planes, bucketCap = cap)
        .as[(Long, Long, Double)].collect().toSeq.sorted
      assert(inc === full, s"trial $trial (n=$n splitMod=$splitMod planes=$planes cap=$cap)")
    }
  }

  test("property: banded kNN candidates are a superset of single-bucket candidates") {
    // band 0's plane group IS the single-bucket plane set, so every
    // single-bucket candidate pair must appear among banded candidates
    // at the PAIR level (top-k can reorder; the candidate sets cannot)
    val dim = Similarity.VecDim
    val rnd = new scala.util.Random(777L)
    val emb = (0L until 80L).map { i =>
      (i, Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding")
    // k large enough that the rank stage keeps everything: directed
    // edges ARE the candidate sets
    val single = Similarity.knnDirected(emb, k = 200, planes = Similarity.LshPlanes)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    val banded = Similarity.knnDirectedBanded(emb, k = 200, bands = 3)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(single.subsetOf(banded),
      s"missing ${(single -- banded).size} single-bucket pairs")
  }
}
