package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X38 — integer-exact BM25 more-like-this (graft.ext.TextOps). */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // Hand-built corpus over ≥3-token docs (shorter ones have no shingles
  // and must drop out). Doc 0 is the query; docs 1.. are candidates with
  // controlled shingle overlap.
  private val docs = Seq(
    (0L, "alpha beta gamma delta"),          // query: shingles (a,b,g), (b,g,d)
    (1L, "alpha beta gamma epsilon"),        // shares (a,b,g)
    (2L, "alpha beta gamma delta zeta"),     // shares both query shingles
    (3L, "eta theta iota kappa"),            // shares nothing
    (4L, "alpha beta gamma delta"),          // identical to the query
    (5L, "xx yy")                            // < 3 tokens: no shingles
  ).toDF("doc_id", "text")

  private def run(nQueries: Int = 1, k: Int = 10, maxDf: Long = 20L) =
    TextOps.bm25MoreLikeThis(docs, "doc_id", "text", nQueries, k, maxDf)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("scores match an independent token-level reference") {
    // Independent reference: shingle the corpus in plain Scala (re-using
    // only the spec-pinned tokenHash), then apply the published integer
    // formula directly — no Spark, no shared query code.
    def shingles(text: String): Seq[Long] = {
      val t = text.split(" ", -1)
      def th(s: String): Long = {
        val pows = Seq.iterate(1L, 8)(_ * 131L)
        val core = pows.zipWithIndex.map { case (p, i) =>
          (if (i < s.length) s.charAt(i).toLong else 0L) * p
        }.sum
        (core + (if (s.nonEmpty) s.last.toLong else 0L) * 1000003L + s.length.toLong * 7L) % Dedup.P
      }
      (0 until t.length - 2).map(i =>
        (th(t(i)) * 10007L + th(t(i + 1)) * 131L + th(t(i + 2))) % Dedup.P)
    }
    val corpus = docs.collect().map(r => r.getLong(0) -> shingles(r.getString(1)))
      .filter(_._2.nonEmpty).toMap
    val nDocs = corpus.size.toLong
    val aC = corpus.values.map(_.size.toLong).sum * 100L / nDocs
    val dfm = corpus.values.flatMap(_.distinct).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    def bitlen(x: Long) = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val qSet = corpus(0L).toSet
    // any doc sharing ≥1 surviving term is a candidate — including at
    // score 0 (idf can floor to 0 when df and N share a bit length)
    val want = corpus.collect { case (id, sh) if id != 0L =>
      val dl = sh.size.toLong
      val shared = sh.groupBy(identity)
        .filter { case (t, _) => qSet.contains(t) && dfm(t) <= 20L }
      val score = shared.map { case (t, inst) =>
        val tf = inst.size.toLong
        val idf = (bitlen(nDocs) - bitlen(dfm(t))).toLong
        idf * 22L * tf * aC * 1000000L / (10L * aC * tf + 3L * aC + 900L * dl)
      }.sum
      (id, score, shared.nonEmpty)
    }.collect { case (id, score, true) => id -> score }.toMap
    val got = run().map { case (_, _, docId, s) => docId -> s }.toMap
    assert(got == want, s"got $got want $want")
  }

  test("ranking: identical doc outranks partial overlap; disjoint doc absent") {
    val r = run()
    val ranked = r.map(_._3)
    assert(ranked.head == 4L, s"identical doc must rank first: ${r.mkString(",")}")
    assert(ranked.indexOf(2L) < ranked.indexOf(1L),
      "two shared shingles must outrank one")
    assert(!ranked.contains(3L), "disjoint doc must not appear")
    assert(!ranked.contains(5L), "shingle-less doc must not appear")
    assert(r.map(_._2).toSeq == (1L to ranked.length).toSeq, "dense ranks")
  }

  test("df ceiling drops hot terms from scoring") {
    // With maxDf=1 every shared shingle (df ≥ 2 by construction) is
    // dropped — no candidate can score.
    assert(run(maxDf = 1L).isEmpty)
  }

  test("HashCounts kernel is bit-identical to the HOF formulation") {
    // adversarial arrays: empty, singleton, all-equal, negative hashes,
    // unsorted input with interleaved repeats, plus real corpus shingles
    val arrays = Seq(
      Seq.empty[Long], Seq(7L), Seq(5L, 5L, 5L), Seq(-3L, 9L, -3L, 0L, 9L, -3L),
      Seq(2L, 1L, 2L, 1L, 3L)).toDF("sh") union
      Dedup.withShingleHashes(docs, "text").select(col(Dedup.ShinglesCol).as("sh"))
    val hof = expr(
      "transform(array_sort(array_distinct(sh)), t -> struct(t AS h, CAST(size(filter(sh, x -> x = t)) AS BIGINT) AS c))")
    val diff = arrays
      .withColumn("fast", org.apache.spark.sql.graft.SignatureKernels.hashCounts(col("sh")))
      .withColumn("ref", hof)
      .filter(!(col("fast") <=> col("ref")))
      .count()
    assert(diff == 0)
  }

  test("plan: broadcast query side and native TopKPerKey, no full-stream window") {
    val plan = TextOps.bm25MoreLikeThis(docs, "doc_id", "text", 1, 10, 20L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"native top-k missing:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"query side not broadcast:\n$plan")
  }
}
