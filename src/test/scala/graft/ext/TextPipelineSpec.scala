package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics pins for the round-10 text-pipeline operators: Gopher rule
 * ordering, bigram-surprisal hand values, CDC shift-robustness, and
 * temperature sampling's exactness properties. */
class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  // ---- gopherRules ----------------------------------------------------

  test("gopherRules: each rule fires, in the fixed audit order") {
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "on")
    val good = (1 to 30).map(i => s"word$i").mkString(" ") + " the of" // 32 words, 2 stops
    val docs = Seq(
      (1L, good),                                        // ok
      (2L, "too short the of"),                          // word_count (4 < 20)
      (3L, ("w " * 32).trim + " the of"),                // mean_word_len < 3 wins over repetition (order pin)
      (4L, (1 to 30).map(i => s"$i$i$i").mkString(" ") + " the of"), // alpha_ratio
      (5L, (1 to 32).map(i => s"word$i").mkString(" ")), // stopwords (0 stops)
      (6L, ("alpha beta the of " * 8).trim)              // 32 words, 4 distinct → repetition
    ).toDF("doc_id", "text")
    val out = TextOps.gopherRules(docs, "doc_id", "text", stop,
        TextOps.GopherBounds(minWords = 20, maxWords = 80))
      .select($"doc_id", $"fail_reason", $"passes").as[(Long, String, Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, "ok", true),
      (2L, "word_count", false),
      (3L, "mean_word_len", false),
      (4L, "alpha_ratio", false),
      (5L, "stopwords", false),
      (6L, "repetition", false)))
  }

  test("gopherRules signals are exact on a hand case") {
    val docs = Seq((7L, "aa bbbb cc dd " * 5 + "the of and to in is on a " +
      (1 to 10).map(i => s"x$i").mkString(" "))).toDF("doc_id", "text")
    val r = TextOps.gopherRules(docs, "doc_id", "text",
      b = TextOps.GopherBounds(minWords = 20, maxWords = 80)).collect()(0)
    assert(r.getAs[Long]("n_words") === 38L) // 20 + 8 + 10
    assert(r.getAs[Long]("n_stop") === 8L)
    // char sum 50 + 17 + 21 = 88 → 88/38 rounded to 6 dp
    assert(r.getAs[Double]("mean_word_len") === 2.315789)
    assert(r.getAs[String]("fail_reason") === "mean_word_len")
  }

  test("GopherBounds defaults are the published Table A1 thresholds (arXiv:2112.11446)") {
    // Rae et al. 2021, Appendix A1.1 quality-filter bounds — pinned so a
    // refactor cannot silently drift the thresholds that define the
    // operator. maxDupWordFrac is this library's duplicate-word
    // adaptation of the paper's separate repetition table (documented on
    // the case class), pinned at its committed value.
    val b = TextOps.GopherBounds()
    assert(b.minWords === 50 && b.maxWords === 100000)
    assert(b.minMeanWordLen === 3.0 && b.maxMeanWordLen === 10.0)
    assert(b.minAlphaFrac === 0.8)
    assert(b.minStopwords === 2)
    assert(b.maxDupWordFrac === 0.5)
  }

  test("gopherRules counts all-caps words as alphabetic (Gopher's 'alphabetic character' rule)") {
    // 30 distinct all-caps words + 2 stops: frac_alpha must be 1.0, not
    // 2/32 — the round-10 advisory's [a-z]-only regex over-fired
    // alpha_ratio on shouty but legitimate text
    val caps = (1 to 30).map(i => s"NASA$i").mkString(" ") + " the of"
    val r = TextOps.gopherRules(Seq((1L, caps)).toDF("doc_id", "text"),
      "doc_id", "text", b = TextOps.GopherBounds(minWords = 20, maxWords = 80)).collect()(0)
    assert(r.getAs[Double]("frac_alpha") === 1.0)
    assert(r.getAs[String]("fail_reason") === "ok")
  }

  // ---- bigramSurprisal ------------------------------------------------

  test("bigramSurprisal: hand-computed digit-count surprisal") {
    // doc1 "a b a b": bigrams ab, ba, ab; doc2 "a c": bigram ac.
    // ctx(a)=3, ctx(b)=1; big(ab)=2, big(ba)=1, big(ac)=1.
    // doc1: (bitlen3-bitlen2)=0 twice, (bitlen1-bitlen1)=0 → sum 0, n 3.
    // doc2: bitlen(3)-bitlen(1) = 2-1 = 1 → sum 1, n 1, avg 1.0.
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextOps.bigramSurprisal(docs, "doc_id", "text")
      .select($"doc_id", $"n_bigrams", $"surprisal_sum", $"avg_surprisal")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, 3L, 0L, 0.0), (2L, 1L, 1L, 1.0)))
  }

  test("bigramSurprisal: single-token and empty docs emit no row; partition-invariant") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val out = TextOps.bigramSurprisal(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(out === Seq(3L))
    val corpus = graft.io.TableIO.read(spark, Sf, "documents")
    val a = TextOps.bigramSurprisal(corpus, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = TextOps.bigramSurprisal(corpus.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  // ---- cdcChunks ------------------------------------------------------

  test("cdcChunks: chunks tile the document exactly") {
    val docs = graft.io.TableIO.read(spark, Sf, "documents").filter(col("doc_id") < 50)
    val bad = TextOps.cdcChunks(docs, "doc_id", "text")
      .groupBy("doc_id")
      .agg(sum("c_len").as("covered"),
        min("c_start").as("first"),
        count(lit(1)).as("n"))
      .join(docs.select(col("doc_id"), length(col("text")).cast("long").as("len")), "doc_id")
      .filter(col("covered") =!= col("len") || col("first") =!= 0)
    assert(bad.count() === 0)
  }

  test("cdcChunks boundaries are content-defined: a prefix edit leaves later chunks intact") {
    val base = graft.io.TableIO.read(spark, Sf, "documents")
      .filter(col("doc_id") === 0).select("doc_id", "text")
    val text = base.as[(Long, String)].collect()(0)._2
    val shifted = Seq((1L, "PREFIX EDIT " + text)).toDF("doc_id", "text")
    val origHashes = TextOps.cdcChunks(base, "doc_id", "text")
      .select("c_hash").as[Long].collect().toSet
    val shiftedHashes = TextOps.cdcChunks(shifted, "doc_id", "text")
      .select("c_hash").as[Long].collect().toSet
    // all original chunks except those touching the edit region reappear
    // under a 12-char shift — the property fixed-stride chunking lacks
    val surviving = origHashes.intersect(shiftedHashes).size
    assert(origHashes.size >= 3, s"doc too short for the test: ${origHashes.size} chunks")
    assert(surviving >= origHashes.size - 2,
      s"content-defined chunks must survive a prefix edit: $surviving of ${origHashes.size}")
  }

  test("cdcChunks kernel is bit-identical to the HOF/oracle formulation") {
    // fixture text plus adversarial shapes: empty, sub-window, exact
    // window, boundary-at-end, non-ASCII (codepoint semantics), long run
    val adversarial = Seq(
      (9001L, ""), (9002L, "abc"), (9003L, "abcd"), (9004L, "abcde"),
      (9005L, "café naïve 中文 text with wider codepoints"),
      (9006L, "x" * 500), (9007L, ("word soup " * 60).trim))
      .toDF("doc_id", "text")
    val corpus = graft.io.TableIO.read(spark, Sf, "documents")
      .select("doc_id", "text").unionAll(adversarial)
    val kernel = TextOps.cdcChunks(corpus, "doc_id", "text").orderBy("doc_id", "chunk_idx")
    val hof = TextOps.cdcChunksHof(corpus, "doc_id", "text").orderBy("doc_id", "chunk_idx")
    // kernel schema is non-nullable where the HOF's CASE/when chain is
    // nullable — names and types must match; the tighter nullability is
    // deliberate
    assert(kernel.schema.map(f => (f.name, f.dataType)) ===
      hof.schema.map(f => (f.name, f.dataType)))
    val k = kernel.collect().toSeq
    val h = hof.collect().toSeq
    assert(k === h && k.size > 500)
  }

  test("cdcChunks: sub-window documents are one whole chunk") {
    val docs = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val out = TextOps.cdcChunks(docs, "doc_id", "text")
      .select($"doc_id", $"chunk_idx", $"c_start", $"c_len")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, 0L, 0L, 3L), (2L, 0L, 0L, 0L)))
  }

  test("property: cdcChunks tiles and reassembles arbitrary unicode text") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // printable ASCII + accents + CJK + an astral codepoint (surrogate
    // pair): the kernel must count code points exactly like substr/ascii
    val charGen = Gen.frequency(
      (8, Gen.choose(32.toChar, 126.toChar).map(_.toString)),
      (2, Gen.oneOf("é", "ü", "中", "文", "☃", "😀")))
    val textGen = Gen.chooseNum(0, 200).flatMap(k => Gen.listOfN(k, charGen).map(_.mkString))
    val texts = Gen.listOfN(200, textGen).apply(Gen.Parameters.default, Seed(7L)).get
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // (1) kernel == HOF on the whole generated batch
    val k = TextOps.cdcChunks(docs, "doc_id", "text").orderBy("doc_id", "chunk_idx").collect().toSeq
    val h = TextOps.cdcChunksHof(docs, "doc_id", "text").orderBy("doc_id", "chunk_idx").collect().toSeq
    assert(k === h)
    // (2) chunks tile: c_start runs are gapless and cover codepoint length
    val bad = TextOps.cdcChunks(docs, "doc_id", "text")
      .groupBy("doc_id").agg(sum("c_len").as("covered"), min("c_start").as("first"))
      .join(docs.select(col("doc_id"), length(col("text")).cast("long").as("len")), "doc_id")
      .filter(col("covered") =!= col("len") || col("first") =!= 0).count()
    assert(bad === 0)
  }

  test("property: bigramSurprisal bigram counts and bounds hold on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val tokGen = Gen.oneOf((1 to 40).map(i => s"t$i"))
    val docGen = Gen.chooseNum(0, 30).flatMap(k => Gen.listOfN(k, tokGen).map(_.mkString(" ")))
    val texts = Gen.listOfN(300, docGen).apply(Gen.Parameters.default, Seed(11L)).get
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextOps.bigramSurprisal(docs, "doc_id", "text")
    // n_bigrams = n_tokens - 1 for every emitted doc; surprisal bounded
    // by [0, 63·n] (digit counts of int64 counts differ by at most 63)
    val joined = out.join(
      docs.select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("n_tok")),
      "doc_id")
    assert(joined.filter(col("n_bigrams") =!= col("n_tok") - 1).count() === 0)
    assert(out.filter(col("surprisal_sum") < 0 ||
      col("surprisal_sum") > col("n_bigrams") * 63).count() === 0)
    // total instances = sum over docs of (n_tok - 1), none dropped
    val total = out.agg(sum("n_bigrams")).as[Long].collect()(0)
    val expected = texts.map(t => math.max(t.split(" ").length - 1, 0)).sum
    assert(total === expected)
  }

  // ---- temperatureAnnotate / temperatureSample ------------------------

  test("temperature sampling: smallest stratum fully kept, thresholds monotone in size") {
    val docs = graft.io.TableIO.read(spark, Sf, "documents")
    val ann = Curation.temperatureAnnotate(docs, "lang", col("doc_id"))
    val stats = ann.groupBy("lang")
      .agg(count(lit(1)).as("n"), max("keep_ppm").as("ppm"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
      .as[(String, Long, Long, Long)].collect().toSeq
    val smallest = stats.minBy(_._2)
    assert(smallest._3 === 1000000L && smallest._4 === smallest._2,
      "smallest stratum must be fully kept at alpha=1/2 normalization")
    // monotone: bigger stratum, lower (or equal) threshold
    for (Seq(a, b) <- stats.sortBy(_._2).sliding(2))
      assert(a._3 >= b._3, s"keep_ppm must not increase with stratum size: $a vs $b")
  }

  test("temperature sampling is partitioning-stable and the filter face matches annotate") {
    val docs = graft.io.TableIO.read(spark, Sf, "documents")
    val a = Curation.temperatureSample(docs, "lang", col("doc_id"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Curation.temperatureSample(docs.repartition(7), "lang", col("doc_id"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val c = Curation.temperatureAnnotate(docs, "lang", col("doc_id"))
      .filter(col("keep")).select("doc_id").as[Long].collect().sorted.toSeq
    assert(a === b && a === c && a.nonEmpty && a.size < 500)
  }
}
