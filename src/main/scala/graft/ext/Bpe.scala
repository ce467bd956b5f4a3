package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding merge TRAINING (Sennrich et al. 2016,
 * arXiv:1508.07909) — the real tokenizer-fit loop, not the regex
 * pre-tokenizer proxy (`TextOps.bpeTokenCount` keeps that budgeting
 * role). Extension surface per BASELINE.json's north star; no analog in
 * the reference.
 *
 * Distributed/driver split is the PUBLISHED shape: the corpus-sized work
 * is one map-side-combined word-type count (every production BPE trainer
 * — subword-nmt, HF tokenizers — trains on word types × counts, not raw
 * text), capped at `maxWordTypes` by (count desc, word asc); the merge
 * loop then runs on the driver over that O(K)-row table, corpus-size
 * INDEPENDENT. The only collect is the capped type table — the same
 * "driver-side-tiny by construction" contract as Bloom's bitset.
 *
 * Determinism: ties in pair frequency break on the lexicographically
 * smallest (left, right); the type-table cap breaks count ties on the
 * word itself. Both pins make the merge list a pure function of the
 * corpus, independent of partitioning — spec-pinned against an
 * independent instance-level reference implementation (the merge loop is
 * data-dependent sequential rewriting, NOT ANSI-SQL-expressible, so this
 * operator is spec-verified like the dependency-patch planner rather
 * than DuckDB-oracled; the harness query is registered rows-only).
 */
object Bpe {

  final case class MergeRow(rank: Int, left: String, right: String, pairCount: Long)

  /** Distributed half: deterministic capped word-type table. */
  def wordTypes(df: DataFrame, textCol: String, maxTypes: Int): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("wcount"))
      .orderBy(col("wcount").desc, col("word"))
      .limit(maxTypes)

  /** Driver half: the merge loop over (word, count) types. Each round
   * recounts adjacent symbol pairs (per-position, weighted by type
   * count), takes the most frequent (ties → smallest (left, right)),
   * and rewrites every type greedily left-to-right. Stops early when no
   * pair occurs twice. O(merges · K · maxWordLen) driver CPU. */
  def trainFromTypes(types: Seq[(String, Long)], merges: Int): Seq[MergeRow] = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    var words: Seq[(Array[String], Long)] =
      types.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val out = Seq.newBuilder[MergeRow]
    var rank = 0
    var done = false
    while (rank < merges && !done) {
      val counts = scala.collection.mutable.LinkedHashMap.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + c))
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        if (n < 2) done = true // a pair seen once compresses nothing
        else {
          out += MergeRow(rank, l, r, n)
          words = words.map { case (syms, c) => (applyMerge(syms, l, r), c) }
          rank += 1
        }
      }
    }
    out.result()
  }

  /** Greedy left-to-right single-merge rewrite (the standard scan: a
   * merged symbol is not re-examined, so "aaa" under (a,a) → ["aa","a"]). */
  def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val b = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += syms(i); i += 1 }
    }
    b.result()
  }

  /** End-to-end train: distributed count, collect the capped types, loop. */
  def train(df: DataFrame, textCol: String, merges: Int, maxTypes: Int): Seq[MergeRow] = {
    import org.apache.spark.sql.Row
    val types = wordTypes(df, textCol, maxTypes).collect().toSeq
      .map { case Row(w: String, c: Long) => (w, c) }
    trainFromTypes(types, merges)
  }

  /** The trained merge list as a frame (the harness-visible artifact). */
  def mergesDf(spark: SparkSession, merges: Seq[MergeRow]): DataFrame = {
    import spark.implicits._
    merges.toDF("rank", "left", "right", "pair_count")
      .select(col("rank").cast("long").as("rank"), col("left"), col("right"),
        col("pair_count"))
  }

  /** Apply trained merges corpus-wide: per-document subword count via the
   * [[org.apache.spark.sql.graft.BpeSegmentCount]] codegen kernel (merge
   * ranks baked as expression parameters — broadcast-free, shuffle-free
   * scan; tokenizing 100 TB is a pure map).
   *
   * INFERENCE SEMANTICS, stated so the counts are not mistaken for
   * HF/subword-nmt-compatible token budgets: each trained merge is
   * applied exactly ONCE in rank order (replaying the trainer's greedy
   * scan), whereas canonical BPE inference re-applies earlier merges
   * when a later merge creates a new adjacency. On words seen at
   * training time the two agree; on unseen words the counts can differ
   * by the re-application opportunities skipped. The once-per-rank form
   * is self-consistent with [[trainFromTypes]] and spec-pinned as such
   * (BpeSpec); swapping in fixed-point re-application is a kernel-local
   * change if HF parity is ever required. */
  def segmentCounts(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[MergeRow]): DataFrame =
    df.select(col(idCol),
      org.apache.spark.sql.graft.SignatureKernels.bpeSegmentCount(
        col(textCol), merges.map(m => (m.left, m.right))).as("n_subwords"))
}
