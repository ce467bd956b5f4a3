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

  /** Driver half, RECOUNT form — the readable reference the incremental
   * trainer is spec-pinned against (production uses
   * [[trainFromTypesIncremental]]). Each round recounts adjacent symbol
   * pairs (per-position, weighted by type count), takes the most
   * frequent (ties → smallest (left, right)), and rewrites every type
   * greedily left-to-right. Stops early when no pair occurs twice.
   * O(merges · K · maxWordLen) driver CPU — fine at tens of merges,
   * quadratic-infeasible at production merge counts. */
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

  /**
   * INCREMENTAL trainer — same result as [[trainFromTypes]] (spec-pinned
   * equal over adversarial + random corpora), but per merge it touches
   * ONLY the types containing the merged pair, the published efficient
   * form (subword-nmt's trainer maintains pair statistics across merges
   * instead of recounting): the recount loop's O(merges · K · maxWordLen)
   * driver cost made a production fit — 32 k merges over ~10⁵ types —
   * ~10¹⁰ operations (the round-10 finding), where this form is
   * O(K · maxWordLen + merges · touched · maxWordLen + heap log).
   *
   * Mechanics: a pair→count map plus a pair→type-ids index are built
   * once; each round takes the best pair from a lazy-deletion max-heap
   * (every count CHANGE pushes a fresh heap entry; an entry is valid
   * only while its count matches the live map — stale entries pop and
   * drop), rewrites just the indexed types, and applies the per-type
   * pair-count DELTA (count pairs before/after the rewrite, weighted by
   * type count). Tie-breaks are the [[trainFromTypes]] contract verbatim:
   * max count, then lexicographically smallest (left, right) — the heap
   * ordering encodes exactly that triple.
   */
  def trainFromTypesIncremental(types: Seq[(String, Long)], merges: Int): Seq[MergeRow] = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    import scala.collection.mutable
    val words: Array[Array[String]] =
      types.map { case (w, _) => w.map(_.toString).toArray }.toArray
    val wcount: Array[Long] = types.map(_._2).toArray
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    // type ids that contained the pair at SOME point — may hold stale
    // ids (a rewrite can remove a pair from a type without unindexing);
    // the rewrite pass re-checks adjacency, and counts live in
    // pairCounts, so staleness costs a scan, never correctness
    val pairWords = mutable.HashMap.empty[(String, String), mutable.ArrayBuffer[Int]]
    final case class Cand(n: Long, l: String, r: String)
    // max-heap: higher count wins; ties → lexicographically SMALLEST
    // (l, r) (reverse string comparison makes the smaller string the
    // greater heap priority)
    val ord: Ordering[Cand] = (x: Cand, y: Cand) => {
      val c = java.lang.Long.compare(x.n, y.n)
      if (c != 0) c
      else {
        val cl = y.l.compareTo(x.l)
        if (cl != 0) cl else y.r.compareTo(x.r)
      }
    }
    val heap = mutable.PriorityQueue.empty[Cand](ord)
    def bump(p: (String, String), delta: Long): Unit = {
      val n = pairCounts.getOrElse(p, 0L) + delta
      if (n == 0L) pairCounts.remove(p) else pairCounts(p) = n
      if (n > 0L) heap.enqueue(Cand(n, p._1, p._2))
    }
    def pairsOf(syms: Array[String]): mutable.HashMap[(String, String), Long] = {
      val m = mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i < syms.length - 1) {
        m.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + 1L))
        i += 1
      }
      m
    }
    var id = 0
    while (id < words.length) {
      pairsOf(words(id)).foreach { case (p, k) =>
        bump(p, k * wcount(id))
        pairWords.getOrElseUpdate(p, mutable.ArrayBuffer.empty) += id
      }
      id += 1
    }
    val out = Seq.newBuilder[MergeRow]
    var rank = 0
    var done = false
    while (rank < merges && !done) {
      // pop to the first LIVE entry (count matches the map)
      var best: Option[Cand] = None
      while (best.isEmpty && heap.nonEmpty) {
        val c = heap.dequeue()
        if (pairCounts.getOrElse((c.l, c.r), 0L) == c.n) best = Some(c)
      }
      best match {
        case Some(c) if c.n >= 2 =>
          out += MergeRow(rank, c.l, c.r, c.n)
          val p = (c.l, c.r)
          val touched = pairWords.remove(p).getOrElse(mutable.ArrayBuffer.empty)
          val seen = mutable.HashSet.empty[Int]
          touched.foreach { wid =>
            if (seen.add(wid)) {
              val before = pairsOf(words(wid))
              if (before.contains(p)) { // stale index entries re-checked here
                val rewritten = applyMerge(words(wid), c.l, c.r)
                words(wid) = rewritten
                val after = pairsOf(rewritten)
                (before.keySet ++ after.keySet).foreach { q =>
                  val d = after.getOrElse(q, 0L) - before.getOrElse(q, 0L)
                  if (d != 0L) bump(q, d * wcount(wid))
                  if (d > 0L)
                    pairWords.getOrElseUpdate(q, mutable.ArrayBuffer.empty) += wid
                }
              }
            }
          }
          rank += 1
        case _ => done = true // heap drained or best pair seen once
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

  /** End-to-end train: distributed count, collect the capped types, then
   * the INCREMENTAL merge loop (production path — feasible at real
   * tokenizer merge counts; [[trainFromTypes]] is the recount reference
   * it is spec-pinned equal to). */
  def train(df: DataFrame, textCol: String, merges: Int, maxTypes: Int): Seq[MergeRow] = {
    import org.apache.spark.sql.Row
    val types = wordTypes(df, textCol, maxTypes).collect().toSeq
      .map { case Row(w: String, c: Long) => (w, c) }
    trainFromTypesIncremental(types, merges)
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
