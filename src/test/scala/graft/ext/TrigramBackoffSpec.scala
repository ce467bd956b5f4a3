package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X4j — stupid-backoff trigram LM (graft.ext.TextOps
 * .trigramBackoffSurprisal), pinned against an independent plain-Scala
 * reference computing the published recursion directly over raw token
 * strings (no kernels, no hit-only join decomposition). */
class TrigramBackoffSpec extends SparkSpec {
  import spark.implicits._

  // Train corpus establishes: a seen trigram ("a b c"), seen bigrams
  // beyond it ("c d"), and unigrams; the score docs exercise all three
  // levels — trigram hit, bigram backoff, unigram backoff incl. OOV.
  private val trainDocs = Seq(
    (1L, "a b c d"),
    (2L, "a b c e"),
    (3L, "e e a")
  ).toDF("doc_id", "text")
  private val scoreDocs = Seq(
    (10L, "a b c"),      // exact trigram hit
    (11L, "d a b"),      // trigram "d a b" unseen, fallback bigram "a b" seen
    (12L, "a a q"),      // "a q" unseen bigram -> unigram level; q is OOV
    (13L, "x y")         // < 3 tokens: must not appear
  ).toDF("doc_id", "text")

  private def th(s: String): Long = {
    val pows = Seq.iterate(1L, 8)(_ * 131L)
    val core = pows.zipWithIndex.map { case (p, i) =>
      (if (i < s.length) s.charAt(i).toLong else 0L) * p
    }.sum
    (core + (if (s.nonEmpty) s.last.toLong else 0L) * 1000003L + s.length.toLong * 7L) % Dedup.P
  }
  private def bitlen(x: Long): Long = (64 - java.lang.Long.numberOfLeadingZeros(x)).toLong

  /** Independent reference: counts as string-keyed maps, the published
   * stupid-backoff recursion per position. */
  private def reference(): Map[Long, (Long, Long, Long, Long, Long)] = {
    val train = trainDocs.collect().map(r => r.getString(1).split(" ", -1))
    def ngrams(n: Int) = train.flatMap(_.sliding(n).filter(_.length == n).map(_.mkString(" ")))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val tri = ngrams(3); val big = ngrams(2); val uni = ngrams(1)
    val nTok = train.map(_.length.toLong).sum
    scoreDocs.collect().map { r =>
      val toks = r.getString(1).split(" ", -1)
      val scored = toks.sliding(3).filter(_.length == 3).toSeq.map { w =>
        val t3 = w.mkString(" "); val c2 = s"${w(0)} ${w(1)}"
        val fb = s"${w(1)} ${w(2)}"; val c1 = w(1); val wt = w(2)
        if (tri.contains(t3)) (0, bitlen(big(c2)) - bitlen(tri(t3)))
        else if (big.contains(fb)) (1, 1L + bitlen(uni(c1)) - bitlen(big(fb)))
        else (2, 2L + bitlen(nTok) - bitlen(uni.getOrElse(wt, 0L) + 1L))
      }
      r.getLong(0) -> (scored.size.toLong,
        scored.count(_._1 == 0).toLong, scored.count(_._1 == 1).toLong,
        scored.count(_._1 == 2).toLong, scored.map(_._2).sum)
    }.filter(_._2._1 > 0).toMap
  }

  test("per-doc surprisals and backoff tallies match the independent reference") {
    val got = TextOps.trigramBackoffSurprisal(trainDocs, scoreDocs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == reference(), s"got $got want ${reference()}")
    // the fixture genuinely exercises every level
    assert(got(10L)._2 == 1L, "doc 10 must be a trigram hit")
    assert(got(11L)._3 == 1L, "doc 11 must back off to the bigram")
    assert(got(12L)._4 == 1L, "doc 12 must back off to the unigram floor")
    assert(!got.contains(13L), "sub-trigram docs must not appear")
  }

  test("tri-hash collision with unseen context: surprisal floored at 0, never NULL-dropped") {
    // Engineer a real collision: two token triples with EQUAL trigram
    // hash but disjoint tokens. Train on one, score the other — the
    // scored instance hits the trigram count table (the collision) while
    // its own context bigram is absent, so c2_n comes back NULL. The
    // uncoalesced form NULLed the whole surprisal: sum() skipped the
    // instance while n_scored counted it, silently deflating
    // avg_surprisal. The fix floors the missing context count at tri_n
    // (surp = 0 here), keeping the sum total.
    val P = Dedup.P
    def tri3(a: Long, b: Long, c: Long): Long = (a * 10007L + b * 131L + c) % P
    def big2(a: Long, b: Long): Long = (a * 10007L + b) % P
    val toks = (0 until 60000).map(i => s"w$i")
    val hs = toks.map(th)
    val rnd = new scala.util.Random(13L)
    val seen = scala.collection.mutable.HashMap.empty[Long, (Int, Int, Int)]
    var hit: Option[((Int, Int, Int), (Int, Int, Int))] = None
    var iters = 0
    while (hit.isEmpty && iters < 3000000) {
      iters += 1
      val (i, j, k) = (rnd.nextInt(toks.size), rnd.nextInt(toks.size), rnd.nextInt(toks.size))
      val t = tri3(hs(i), hs(j), hs(k))
      seen.get(t) match {
        case Some((a, b, c)) if Set(a, b, c).intersect(Set(i, j, k)).isEmpty &&
            Seq(hs(a), hs(b), hs(c), hs(i), hs(j), hs(k)).distinct.size == 6 &&
            // the scored context/backoff bigrams must genuinely MISS the
            // train bigram table {(a,b),(b,c)} — that is the branch under test
            !Set(big2(hs(a), hs(b)), big2(hs(b), hs(c)))
              .exists(x => x == big2(hs(i), hs(j)) || x == big2(hs(j), hs(k))) =>
          hit = Some(((a, b, c), (i, j, k)))
        case Some(_) => ()
        case None => seen.put(t, (i, j, k))
      }
    }
    assert(hit.nonEmpty, s"no trigram collision found in $iters draws")
    val ((a, b, c), (d, e, f)) = hit.get
    val train = Seq((1L, s"${toks(a)} ${toks(b)} ${toks(c)}")).toDF("doc_id", "text")
    val score = Seq((2L, s"${toks(d)} ${toks(e)} ${toks(f)}")).toDF("doc_id", "text")
    val row = TextOps.trigramBackoffSurprisal(train, score, "doc_id", "text").collect()
    assert(row.length == 1)
    val r = row(0)
    assert(r.getLong(1) == 1L && r.getLong(2) == 1L,
      s"collision instance must score as a trigram hit: $r")
    assert(!r.isNullAt(5) && r.getLong(5) == 0L,
      s"collision surprisal must be floored at 0, not NULL-dropped: $r")
    assert(!r.isNullAt(6) && r.getDouble(6) == 0.0, s"avg must include the instance: $r")
  }

  test("TrigramTuples kernel is bit-identical to the HOF formulation") {
    val arrays = (Seq(Seq.empty[Long], Seq(1L), Seq(1L, 2L), Seq(-5L, 7L, 11L, 13L, 7L))
      .toDF("h") union
      trainDocs.select(org.apache.spark.sql.graft.SignatureKernels
        .tokenHashes(split(col("text"), " "), Dedup.P).as("h")))
    val hof = expr(
      s"""CASE WHEN size(h) < 3 THEN array()
         |ELSE transform(sequence(1, size(h) - 2), i -> struct(
         |  (element_at(h, i) * 10007 + element_at(h, i + 1) * 131
         |     + element_at(h, i + 2)) % ${Dedup.P} AS tri,
         |  (element_at(h, i) * 10007 + element_at(h, i + 1)) % ${Dedup.P} AS c2,
         |  (element_at(h, i + 1) * 10007 + element_at(h, i + 2)) % ${Dedup.P} AS fb,
         |  element_at(h, i + 1) AS c1,
         |  element_at(h, i + 2) AS w)) END""".stripMargin)
    val diff = arrays
      .withColumn("fast", org.apache.spark.sql.graft.SignatureKernels
        .trigramTuples(col("h"), Dedup.P))
      .withColumn("ref", hof)
      .filter(!(col("fast") <=> col("ref")))
      .count()
    assert(diff == 0)
  }
}
