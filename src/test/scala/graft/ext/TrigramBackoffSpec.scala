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
