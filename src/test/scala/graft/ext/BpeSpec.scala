package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * BPE training + application pins. The merge loop is spec-verified (not
 * DuckDB-oracled — data-dependent sequential rewriting), so the reference
 * here must be INDEPENDENT: it works over raw word instances (no type
 * table, no cap) and recounts from scratch every round — a different
 * factorization whose agreement with the type-table trainer is the
 * correctness argument.
 */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Instance-level reference: expand the corpus to word instances and
   * run the textbook loop (count adjacent pairs over every instance,
   * merge the argmax with (left,right) tie-break, repeat). */
  private def referenceTrain(corpus: Seq[String], merges: Int): Seq[(String, String, Long)] = {
    var words: Seq[Array[String]] = corpus
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      .map(_.map(_.toString).toArray)
    val out = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var stop = false
    while (k < merges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for (syms <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + 1))
      val best = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case Some(((l, r), n)) if n >= 2 =>
          out += ((l, r, n))
          words = words.map(Bpe.applyMerge(_, l, r))
          k += 1
        case _ => stop = true
      }
    }
    out.result()
  }

  /** Reference segmentation for one doc under a merge list. */
  private def referenceSegmentCount(text: String, merges: Seq[(String, String)]): Long =
    text.split(" ").filter(_.nonEmpty).map { w =>
      var syms = w.map(_.toString).toArray
      for ((l, r) <- merges) syms = Bpe.applyMerge(syms, l, r)
      syms.length.toLong
    }.sum

  test("trainer matches the instance-level reference on the fixture corpus") {
    val docs = graft.io.TableIO.read(spark, Sf, "documents")
    val texts = docs.select("text").as[String].collect().toSeq
    // cap high enough that nothing is dropped: the two factorizations
    // must agree exactly when the type table is complete
    val trained = Bpe.train(docs, "text", merges = 20, maxTypes = 1000000)
      .map(m => (m.left, m.right, m.pairCount))
    val ref = referenceTrain(texts, 20)
    assert(trained === ref && trained.size === 20)
  }

  test("trainer matches the reference on adversarial corpora (overlaps, ties, unicode)") {
    val corpora = Seq(
      Seq("aaa aaa aa"),                    // overlapping pair positions
      Seq("ab ab ba ba"),                   // exact tie → (a,b) beats (b,a)
      Seq("x", "y", "z"),                   // nothing repeats → early stop
      Seq("abcabc abcabc", "cabca"),        // chained merges
      Seq("中文 中文 文中", "naïve naïve")) // non-ASCII symbols
    for (corpus <- corpora) {
      val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val trained = Bpe.train(df, "text", merges = 10, maxTypes = 1000)
        .map(m => (m.left, m.right, m.pairCount))
      assert(trained === referenceTrain(corpus, 10), s"corpus $corpus diverged")
    }
  }

  test("incremental trainer equals the recount trainer on adversarial type tables") {
    // the two factorizations share only applyMerge: recount rebuilds the
    // full pair map every round, incremental maintains it by per-type
    // deltas + a lazy-deletion heap — exact agreement (pair, count, and
    // order) over overlap/tie/early-stop/unicode shapes is the pin
    val tables: Seq[Seq[(String, Long)]] = Seq(
      Seq(("aaa", 3L), ("aa", 1L)),                         // overlapping positions
      Seq(("ab", 2L), ("ba", 2L)),                          // exact tie → (a,b)
      Seq(("x", 5L), ("y", 4L), ("z", 3L)),                 // nothing repeats → stop
      Seq(("abcabc", 2L), ("cabca", 1L), ("bcab", 4L)),     // chained merges
      Seq(("中文", 2L), ("文中", 1L), ("naïve", 2L)),        // non-ASCII
      Seq(("aaaa", 1L), ("aaa", 1L), ("aa", 7L), ("a", 9L)) // self-pair cascades
    )
    for (types <- tables; m <- Seq(1, 3, 10))
      assert(Bpe.trainFromTypesIncremental(types, m) === Bpe.trainFromTypes(types, m),
        s"types $types merges $m diverged")
  }

  test("incremental trainer equals the recount trainer on random type tables") {
    // deterministic LCG corpus over a 4-letter alphabet: heavy pair
    // collisions, deep chains, count ties
    var s = 12345L
    def nxt(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s >>> 11 }
    for (trial <- 1 to 5) {
      val types = (0 until 300).map { _ =>
        val len = 1 + (nxt() % 10).toInt
        val w = (0 until len).map(_ => ('a' + (nxt() % 4).toInt).toChar).mkString
        (w, 1L + (nxt() % 7))
      }.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }.toSeq
      assert(Bpe.trainFromTypesIncremental(types, 50) === Bpe.trainFromTypes(types, 50),
        s"trial $trial diverged")
    }
  }

  test("incremental trainer makes production merge counts driver-feasible") {
    // 2 000 merges over 10 000 types: the recount loop is O(merges · K ·
    // len) ≈ 2·10⁸ full-map rebuilds (the round-10 scale finding — a real
    // 32 k-merge fit is ~10¹⁰); the incremental form touches only
    // indexed types per merge and must complete in seconds, not minutes
    var s = 98765L
    def nxt(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s >>> 11 }
    val types = (0 until 10000).map { i =>
      val len = 4 + (nxt() % 12).toInt
      val w = (0 until len).map(_ => ('a' + (nxt() % 5).toInt).toChar).mkString
      (w + i.toString.takeRight(1), 1L + (nxt() % 100)) // suffix keeps types distinct-ish
    }.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }.toSeq
    val t0 = System.nanoTime()
    val merges = Bpe.trainFromTypesIncremental(types, 2000)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(merges.size > 500, s"corpus must supply real merge depth, got ${merges.size}")
    assert(sec < 10.0, s"incremental trainer took $sec s for 2k merges x 10k types")
  }

  test("greedy merge scan: overlapping occurrences are not re-merged") {
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq === Seq("aa", "a"))
    assert(Bpe.applyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq === Seq("aa", "aa"))
  }

  test("segmentCounts kernel matches the reference segmentation per document") {
    val docs = graft.io.TableIO.read(spark, Sf, "documents")
    val merges = Bpe.train(docs, "text", merges = 20, maxTypes = 500)
    val kernel = Bpe.segmentCounts(docs, "doc_id", "text", merges)
      .as[(Long, Long)].collect().toMap
    val expected = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> referenceSegmentCount(t, merges.map(m => (m.left, m.right))) }
      .toMap
    assert(kernel === expected && kernel.nonEmpty)
    // merges compress: subwords strictly fewer than characters for docs
    // containing any merged pair; never fewer than word count
    val words = docs.select(col("doc_id"), TextOps.tokenCount(col("text")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(kernel.forall { case (id, n) => n >= words(id) })
  }

  test("property: trainer and kernel agree with the reference on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // small alphabet forces heavy pair collisions and deep merge chains
    val wordGen = Gen.chooseNum(1, 8).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("a", "b", "c", "é")).map(_.mkString))
    val docGen = Gen.chooseNum(0, 12).flatMap(k => Gen.listOfN(k, wordGen).map(_.mkString(" ")))
    val corpusGen = Gen.chooseNum(1, 40).flatMap(k => Gen.listOfN(k, docGen))
    for (seed <- 1L to 5L) {
      val corpus = corpusGen.apply(Gen.Parameters.default, Seed(seed)).get
      val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val trained = Bpe.train(df, "text", merges = 8, maxTypes = 100000)
      assert(trained.map(m => (m.left, m.right, m.pairCount)) ===
        referenceTrain(corpus, 8), s"seed $seed trainer diverged")
      val pairs = trained.map(m => (m.left, m.right))
      val kernel = Bpe.segmentCounts(df, "id", "text", trained)
        .as[(Long, Long)].collect().toMap
      val expected = corpus.zipWithIndex
        .map { case (t, i) => i.toLong -> referenceSegmentCount(t, pairs) }.toMap
      assert(kernel === expected, s"seed $seed kernel diverged")
    }
  }

  test("segmentCounts is partitioning-stable and the query surface runs") {
    val docs = graft.io.TableIO.read(spark, Sf, "documents")
    val merges = Bpe.train(docs, "text", merges = 5, maxTypes = 200)
    val a = Bpe.segmentCounts(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().toSeq
    val b = Bpe.segmentCounts(docs.repartition(7), "doc_id", "text", merges)
      .orderBy("doc_id").collect().toSeq
    assert(a === b && a.nonEmpty)
  }
}
