package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.{Bloom, Curation, Dedup, Linkage}
import graft.ext.TextOps
import graft.io.TableIO

/**
 * Round-6 pipeline-operator queries (SURVEY.md §2.11 X2g, X28–X31):
 * Bloom-prefiltered decontamination, duplicate-span statistics, blocked
 * fuzzy record linkage, GPT-style sequence packing, and the cross-source
 * duplication census. Each entry exercises the real operator code in
 * graft.ext and carries a hand-written DuckDB mirror.
 */
object PipelineQueries {

  private val shinglesSql = OracleSql.shingles

  /** Per-JVM backfill replay memo (the StateStore discipline): the
   * 3-batch `batch_<id>` history is landed and replayed through
   * [[graft.run.StreamingCuration.foldBatch]] ONCE per sf dir; every
   * execution of the registered query — including every bench sample
   * after the first — reads the swapped ledger only, which is what a
   * monitoring job pays between batches. Scratch-rooted per JVM, so a
   * regenerated fixture can never meet a stale ledger. */
  private val backfillBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Bench staging hooks (r17 verdict #5 / ADVICE): land + replay the
   * backfill history and build the curation ledger OUTSIDE the timed
   * region — the registered queries then measure what a monitoring job
   * pays between batches (swapped-ledger read / state read + delta),
   * and the bench spread stops reporting one-time construction as
   * operator noise. Verify still covers the build paths end-to-end. */
  val prepares: Map[String, (org.apache.spark.sql.SparkSession, String) => Unit] = Map(
    "pipeline_backfill" -> ((s, dir) => {
      backfillStateDir(s, dir, TextOps.GopherBounds(minWords = 20, maxWords = 80)); ()
    }),
    "pipeline_incremental" -> ((s, dir) => {
      curationStateLoad(s, dir, TextOps.GopherBounds(minWords = 20, maxWords = 80)); ()
    }))

  /** The persisted curation-ledger loader shared by pipeline_incremental
   * and its prepare hook (StateStore: built once per JVM per sf dir). */
  private def curationStateLoad(s: org.apache.spark.sql.SparkSession, dir: String,
      b: TextOps.GopherBounds): String => org.apache.spark.sql.DataFrame = {
    val docs = TableIO.read(s, dir, "documents")
    graft.run.StateStore.materialize(
      s, s"curation_${graft.run.StateStore.dirKey(dir)}",
      graft.ext.PipelineIncremental.toFrames(
        graft.ext.PipelineIncremental.curationState(
          docs.filter(col("doc_id") % 20 =!= 19),
          "doc_id", "text", "lang", "source", bounds = b)))
  }

  private def backfillStateDir(s: org.apache.spark.sql.SparkSession,
      dir: String, b: TextOps.GopherBounds): String =
    backfillBuilt.computeIfAbsent(graft.run.StateStore.dirKey(dir), _ => {
      val root = graft.io.TableIO.scratchDir("backfill") + "/" +
        graft.run.StateStore.dirKey(dir)
      val docs = TableIO.read(s, dir, "documents")
      (0 until 3).foreach { i =>
        graft.run.Backfill.writeBatch(
          docs.filter(pmod(col("doc_id"), lit(3)) === i), s"$root/batches", i.toLong)
      }
      graft.run.Backfill.replay(s, s"$root/batches") { (batch, id) =>
        graft.run.StreamingCuration.foldBatch(batch, id, s"$root/state",
          "doc_id", "text", "lang", "source", bounds = b)
      }
      root
    }) + "/state"

  val all: Seq[Q] = Seq(

    // X28 — decontamination with a Bloom prefilter: build an 8 KiB bitset
    // over the eval (src0) shingle set, discard corpus shingles map-side,
    // exact-verify only the candidates. The OUTPUT is exact (Bloom filters
    // have no false negatives and the verify join removes false
    // positives), so the oracle is the plain semi-join — the bitset is an
    // execution strategy, not a semantics change. Complements
    // contamination_check (which reports per-doc overlap fractions over
    // ALL docs); this lists only the contaminated docs with hit counts,
    // the shape a quarantine step consumes.
    Q("bloom_contamination",
      (s, dir) => {
        val sh = Dedup.withShingleHashes(TableIO.read(s, dir, "documents"), "text")
          .select(col("doc_id"), col("source"), explode_outer(col(Dedup.ShinglesCol)).as("sh"))
          .filter(col("sh").isNotNull)
        val train = sh.filter(col("source") =!= "src0").select("doc_id", "sh").distinct()
        val evalSh = sh.filter(col("source") === "src0").select("sh").distinct()
        val words = Bloom.buildWords(evalSh, "sh")
        train
          .filter(Bloom.mightContain(words, col("sh")))
          .join(evalSh, Seq("sh"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
          .orderBy("doc_id")
      },
      Some(s"""WITH s AS (
              |  SELECT doc_id, source, unnest($shinglesSql) AS sh FROM documents),
              |tr AS (SELECT DISTINCT doc_id, sh FROM s WHERE source <> 'src0'),
              |ev AS (SELECT DISTINCT sh FROM s WHERE source = 'src0')
              |SELECT tr.doc_id, count(*) AS n_overlap
              |FROM tr JOIN ev USING (sh)
              |GROUP BY 1
              |ORDER BY 1""".stripMargin)),

    // X2g — duplicate-span statistics: the longest run of consecutive
    // cross-duplicated chunks per document (exact-substring-dedup
    // detection at chunk granularity, Lee et al. 2021).
    Q("dup_span_stats",
      (s, dir) => Dedup.dupSpanStats(
          TableIO.read(s, dir, "documents"), "doc_id", "text", chunkSize = 8)
        .orderBy("doc_id"),
      Some(s"""WITH base AS (SELECT doc_id, ${OracleSql.chunks(8)} AS arr FROM documents),
              |ch AS (SELECT doc_id, unnest(range(0, len(arr))) AS idx, unnest(arr) AS chunk FROM base),
              |cdf AS MATERIALIZED (SELECT chunk, count(*) AS cdf
              |        FROM (SELECT DISTINCT doc_id, chunk FROM ch) GROUP BY 1),
              |fl AS (SELECT ch.doc_id, ch.idx, cdf.cdf > 1 AS is_dup FROM ch JOIN cdf USING (chunk)),
              |tot AS (SELECT doc_id, count(*) AS n_chunks,
              |        sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS n_dup_chunks FROM fl GROUP BY 1),
              |dup AS (SELECT doc_id, idx,
              |        idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS grp
              |        FROM fl WHERE is_dup),
              |runs AS (SELECT doc_id, grp, count(*) AS run_len FROM dup GROUP BY 1, 2),
              |pd AS (SELECT doc_id, max(run_len) AS max_dup_run FROM runs GROUP BY 1)
              |SELECT d.doc_id,
              |  CAST(coalesce(tot.n_chunks, 0) AS BIGINT) AS n_chunks,
              |  CAST(coalesce(tot.n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks,
              |  CAST(coalesce(pd.max_dup_run, 0) AS BIGINT) AS max_dup_run,
              |  CAST(coalesce(pd.max_dup_run, 0) * 8 AS BIGINT) AS max_dup_tokens
              |FROM documents d
              |LEFT JOIN tot ON d.doc_id = tot.doc_id
              |LEFT JOIN pd ON d.doc_id = pd.doc_id
              |ORDER BY d.doc_id""".stripMargin)),

    // X2g-apply — span-dedup rewrite: documents with cross-duplicated
    // chunks removed, sub-chunk tail kept verbatim (the Lee et al.
    // rewrite step; dup_span_stats is the detection step). Text crosses
    // the wire exactly once, in the final assembly join.
    Q("dedup_span_apply",
      (s, dir) => Dedup.dedupSpans(
          TableIO.read(s, dir, "documents"), "doc_id", "text", chunkSize = 8)
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks,
              |                  CAST(len(string_split(text,' ')) AS BIGINT) AS n,
              |                  ${OracleSql.chunks(8)} AS arr FROM documents),
              |ch AS (SELECT doc_id, unnest(range(0, len(arr))) AS idx, unnest(arr) AS chunk FROM t),
              |cdf AS MATERIALIZED (SELECT chunk, count(*) AS cdf
              |        FROM (SELECT DISTINCT doc_id, chunk FROM ch) GROUP BY 1),
              |fl AS (SELECT ch.doc_id, ch.idx, cdf.cdf > 1 AS is_dup FROM ch JOIN cdf USING (chunk)),
              |kept AS MATERIALIZED (SELECT doc_id,
              |         array_agg(idx ORDER BY idx) FILTER (WHERE NOT is_dup) AS ki
              |         FROM fl GROUP BY 1)
              |SELECT t.doc_id,
              |  CAST(len(flatten(list_transform(coalesce(kept.ki, []), i -> t.toks[i*8+1 : i*8+8])))
              |       + (t.n - t.n // 8 * 8) AS BIGINT) AS n_kept_tokens,
              |  coalesce(array_to_string(flatten(list_transform(coalesce(kept.ki, []), i -> t.toks[i*8+1 : i*8+8]))
              |                  || t.toks[t.n // 8 * 8 + 1 : t.n], ' '), '') AS kept_text
              |FROM t LEFT JOIN kept ON t.doc_id = kept.doc_id
              |ORDER BY t.doc_id""".stripMargin)),

    // X29 — blocked fuzzy nearest neighbor over part names: candidates
    // only within a brand block, length-difference prefilter, exact
    // Levenshtein, best match per record by (dist, match_id).
    //
    // SPREAD ADJUDICATION (r15, closing the r14 "1.56–11.09 s over 4
    // samples" triage item): two fresh-JVM min-of-4 runs on the same
    // box show the identical MONOTONE decay — 13.69, 3.49, 2.61, 2.49
    // and 8.83, 2.45, 2.05, 1.93 — i.e. C2 compilation of the large
    // levenshtein codegen method reaching steady state at sample 3-4
    // (the shape Bench.scala's min-of-4-for->1s rule exists for), not a
    // bimodal plan. The committed min is stable across rounds
    // (1.56-2.5 s tracking box quality); no plan change warranted.
    // The oracle mirrors the block-size cap too: part scales with SF
    // (SF·8000 rows per brand block), so a cap-free oracle would diverge
    // from the engine the moment a bench SF pushes a block past the cap —
    // the cap is part of the operator's semantics, not an impl detail.
    Q("fuzzy_match_nn",
      (s, dir) => Linkage.nearestInBlock(
          TableIO.read(s, dir, "part"), "p_partkey", "p_name",
          blockCols = Seq("p_brand"), maxDist = 3, blockCap = 10000L)
        .orderBy("p_partkey"),
      Some("""WITH capped AS (
             |  SELECT p_partkey, p_name, p_brand
             |  FROM (SELECT p_partkey, p_name, p_brand,
             |               count(*) OVER (PARTITION BY p_brand) AS bsize FROM part)
             |  WHERE bsize <= 10000),
             |cand AS (
             |  SELECT a.p_partkey, a.p_name, b.p_partkey AS match_id, b.p_name AS match_str,
             |         levenshtein(a.p_name, b.p_name) AS dist
             |  FROM capped a JOIN capped b
             |    ON a.p_brand = b.p_brand AND a.p_partkey <> b.p_partkey
             |   AND abs(length(a.p_name) - length(b.p_name)) <= 3),
             |best AS (
             |  SELECT *, row_number() OVER (PARTITION BY p_partkey ORDER BY dist, match_id) AS rk
             |  FROM cand WHERE dist <= 3)
             |SELECT p_partkey, p_name, match_id, match_str, CAST(dist AS INT) AS dist
             |FROM best WHERE rk = 1
             |ORDER BY p_partkey""".stripMargin)),

    // X29 companion — the blockCap recall audit: how many blocks/rows a
    // cap of 50 would silently drop from each linkage side. The cap is
    // set LOW here on purpose so the dropped counts are non-trivial.
    Q("linkage_block_audit",
      (s, dir) => {
        val part = TableIO.read(s, dir, "part")
        Linkage.blockCapAudit(part, part, Seq("p_brand"), blockCap = 50L)
          .orderBy("side")
      },
      Some("""WITH bs AS (
             |  SELECT p_brand, count(*) AS n FROM part GROUP BY p_brand),
             |one AS (
             |  SELECT count(*) AS blocks, CAST(sum(n) AS BIGINT) AS n_rows,
             |         CAST(sum(CASE WHEN n > 50 THEN 1 ELSE 0 END) AS BIGINT) AS dropped_blocks,
             |         CAST(sum(CASE WHEN n > 50 THEN n ELSE 0 END) AS BIGINT) AS dropped_rows,
             |         CAST(max(n) AS BIGINT) AS largest_block
             |  FROM bs)
             |SELECT side, blocks, n_rows, dropped_blocks, dropped_rows, largest_block
             |FROM (SELECT 'probe' AS side, * FROM one UNION ALL SELECT 'match' AS side, * FROM one)
             |ORDER BY side""".stripMargin)),

    // X30 — GPT-style sequence packing at 512 tokens, grouped by lang:
    // where each document lands in the concatenated token stream and how
    // many sequence boundaries it straddles.
    //
    // ADJUDICATION of the r13 driver-bench spread (1.85–7.05 s over 5
    // samples vs the committed 0.47 s min): r14 `probe_sp` min-of-5 A/B,
    // both probe orders. The big first-sample cost follows the SLOT, not
    // the shape (REG-first: 6.4 s then ~1 s; eager-offsets-first: 7.5 s
    // then ~1 s, REG second 0.93–1.75 s) — fresh-JVM first-query warm-up
    // plus hypervisor steal, not a plan defect. Steady state is
    // 0.84–1.2 s for both forms. packSequences now eagerly pins the
    // post-exchange chunk assignment (determinism hardening — a second
    // execution of the range exchange can legally draw different sample
    // boundaries; spec-pinned by the giant-group test), same steady-state
    // cost.
    Q("sequence_pack",
      (s, dir) => Curation.packSequences(
          TableIO.read(s, dir, "documents"), "doc_id", "lang",
          TextOps.tokenCount(col("text")), seqLen = 512L)
        .orderBy("lang", "doc_id"),
      Some("""WITH t AS (
             |  SELECT lang, doc_id,
             |         CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens FROM documents),
             |c AS (
             |  SELECT lang, doc_id, n_tokens,
             |    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS start_tok
             |  FROM t)
             |SELECT lang, doc_id, n_tokens, start_tok,
             |  start_tok // 512 AS first_seq,
             |  CASE WHEN n_tokens > 0
             |       THEN (start_tok + n_tokens - 1) // 512 - start_tok // 512 + 1
             |       ELSE 1 END AS n_seqs,
             |  start_tok % 512 AS offset_in_seq
             |FROM c
             |ORDER BY lang, doc_id""".stripMargin)),

    // X33 — RAG-style document chunking: 64-token windows, stride 48
    // (16-token overlap); the last window runs short. Pure map — no
    // shuffle; integer chunk-count arithmetic mirrored exactly.
    Q("doc_chunking",
      (s, dir) => TextOps.chunkDocs(
          TableIO.read(s, dir, "documents"), "doc_id", "text",
          chunkTokens = 64, stride = 48)
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text,' ') AS toks,
             |         CAST(len(string_split(text,' ')) AS BIGINT) AS n FROM documents),
             |c AS (
             |  SELECT doc_id,
             |         unnest(range(0, 1 + greatest(0, (n - 64 + 47) // 48))) AS chunk_idx
             |  FROM t)
             |SELECT c.doc_id, c.chunk_idx,
             |  least(64, t.n - c.chunk_idx * 48) AS n_chunk_tokens,
             |  array_to_string(t.toks[c.chunk_idx * 48 + 1 : c.chunk_idx * 48 + 64], ' ') AS chunk_text
             |FROM c JOIN t ON c.doc_id = t.doc_id
             |ORDER BY c.doc_id, c.chunk_idx""".stripMargin)),

    // X6+ — approx quantiles with a PROVEN rank band (the percentile
    // face of the approx_distinct pattern): Spark's GK sketch
    // (percentile_approx, accuracy A) guarantees rank error ≤ n/A, so
    // the estimate must lie between the exact order statistics at
    // ranks ceil(q·n) ∓ (n div A + 1). The query emits the exact disc
    // percentiles (order statistics — data values, bit-exact
    // cross-engine) plus in-band booleans; DuckDB recomputes the disc
    // values by the same rank formula and asserts the bands literally.
    // At 100 TB the sketch is the only viable path (fixed memory, one
    // pass, mergeable); the band check is what makes it TRUSTABLE.
    Q("approx_quantiles",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val acc = 1000
        val base = TableIO.read(s, dir, "lineitem")
          .select(col("l_returnflag").as("flag"), col("l_quantity").as("q"))
        // HISTOGRAM form of value-at-rank: a per-flag row_number would
        // serialize each flag's 200k rows through one reducer (3 groups
        // = 3 cores). Collapse to (flag, value) counts first — fully
        // parallel, map-side combined — then the cumulative window runs
        // over the DISTINCT values only (tiny). Order statistic r =
        // min value whose cumulative count ≥ r. Assumes a bounded value
        // domain (quantities/prices/counts — true of this audit face);
        // an unbounded continuous column would bucket first.
        val counts = base.groupBy("flag", "q").agg(count(lit(1)).as("__c"))
          .withColumn("__cum", sum("__c").over(Window.partitionBy("flag").orderBy("q")))
        val stats = base.groupBy("flag").agg(
          count(lit(1)).as("n"),
          expr(s"percentile_approx(q, array(0.5D, 0.9D), $acc)").as("ap"))
        def rk(qq: Double) = ceil(lit(qq) * col("n")).cast("long")
        val err = (col("n") / acc).cast("long") + lit(1L)
        def lo(qq: Double) = greatest(lit(1L), rk(qq) - err)
        def hi(qq: Double) = least(col("n"), rk(qq) + err)
        def vAt(r: org.apache.spark.sql.Column, name: String) =
          min(when(col("__cum") >= r, col("q"))).as(name)
        counts.join(broadcast(stats), "flag")
          .groupBy("flag")
          .agg(
            first("n").as("n"),
            first("ap").as("__ap"),
            vAt(rk(0.5), "p50_disc"), vAt(lo(0.5), "__p50_lo"), vAt(hi(0.5), "__p50_hi"),
            vAt(rk(0.9), "p90_disc"), vAt(lo(0.9), "__p90_lo"), vAt(hi(0.9), "__p90_hi"))
          .select(col("flag"), col("n"), col("p50_disc"), col("p90_disc"),
            element_at(col("__ap"), 1).between(col("__p50_lo"), col("__p50_hi")).as("p50_in_band"),
            element_at(col("__ap"), 2).between(col("__p90_lo"), col("__p90_hi")).as("p90_in_band"))
          .orderBy("flag")
      },
      Some("""WITH b AS (SELECT l_returnflag AS flag, l_quantity AS q FROM lineitem),
             |r AS (SELECT flag, q, row_number() OVER (PARTITION BY flag ORDER BY q) AS rn FROM b),
             |n AS (SELECT flag, count(*) AS n FROM b GROUP BY 1)
             |SELECT r.flag, first(n.n) AS n,
             |  max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN q END) AS p50_disc,
             |  max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN q END) AS p90_disc,
             |  TRUE AS p50_in_band,
             |  TRUE AS p90_in_band
             |FROM r JOIN n ON r.flag = n.flag
             |GROUP BY 1
             |ORDER BY 1""".stripMargin)),

    // §2.9+ — join-key skew audit: the diagnostic that decides between a
    // plain join, AQE skew handling, and ops/Salting. Exact integer
    // micro-unit shares; TakeOrdered over the aggregate, never a full
    // sort — safe on the full input ahead of a join.
    Q("skew_audit",
      (s, dir) => graft.ops.Salting.keySkewAudit(
          TableIO.read(s, dir, "events"), Seq("user_id"), topN = 20)
        .withColumnRenamed("user_id", "key"),
      Some("""WITH c AS (SELECT user_id AS key, count(*) AS n FROM events GROUP BY 1),
             |t AS (SELECT count(*) AS total FROM events)
             |SELECT key, n, n * 1000000 // total AS share_us
             |FROM c, t
             |ORDER BY n DESC, key
             |LIMIT 20""".stripMargin)),

    // X31 — cross-source duplication census on the 3-token prefix key
    // (digested to md5 so only a 32-char key ever shuffles): distinct
    // shared content keys per source pair — the input to mixing-weight
    // decisions.
    Q("cross_source_overlap",
      (s, dir) => Curation.crossSourceOverlap(
          TableIO.read(s, dir, "documents"),
          md5(TextOps.prefixKey(col("text"))), "source")
        .orderBy("src_a", "src_b"),
      Some(s"""WITH ks AS (
              |  SELECT DISTINCT md5(${OracleSql.prefixKey(3)}) AS k, source AS s FROM documents)
              |SELECT a.s AS src_a, b.s AS src_b, count(*) AS n_shared
              |FROM ks a JOIN ks b ON a.k = b.k AND a.s < b.s
              |GROUP BY 1, 2
              |ORDER BY 1, 2""".stripMargin)),

    // X42 — the END-TO-END curation pipeline composition (ext/Pipeline):
    // Gopher rules → span-dedup rewrite → verified near-dup drop →
    // Bloom eval-decontamination → temperature sampling → sequence
    // packing, with the per-stage doc/token census a run ledger records.
    // The oracle chains each stage's existing CTE mirror over the
    // PREVIOUS stage's output — the hash match proves the composition,
    // not just the parts.
    Q("pipeline_e2e",
      (s, dir) => graft.ext.Pipeline.curationPipeline(
        TableIO.read(s, dir, "documents"), "doc_id", "text", "lang", "source",
        bounds = TextOps.GopherBounds(minWords = 20, maxWords = 80)),
      Some(pipelineCensusOracle)),

    // X42b — the INCREMENTAL face of the curation pipeline: documents
    // split 95/5 (doc_id % 20 = 19 as the delta batch, a production
    // ingest-batch size), the corpus curated into the stored-state
    // ledger, the delta then curated incrementally against it. The
    // uniform 20% split the query used through r14 sat ON the measured
    // uniform-delta regime boundary where incremental ≈ rebuild by
    // construction — it timed the boundary, not the operator; the 5%
    // batch is the shape the ScaleBench family measures at 7.7 vs 40
    // CPU-s rebuild. The incremental pass: chunk-df flips re-rewriting
    // stored docs, touched candidate buckets recomputed whole under
    // union caps (cap flips can resurrect state-dropped docs), stored
    // Jaccard verdicts carried for untouched buckets, eval-set growth
    // probed against the stored shingle index. The oracle is the FULL
    // BATCH census over the union (the same chained CTE mirror as
    // pipeline_e2e), so the hash match IS the incremental-equals-rebuild
    // proof at sf scale; PipelineIncrementalSpec pins the adversarial
    // corners fixtures may not hit.
    //
    // The stored ledger is PERSISTED: built + written to parquet once per
    // JVM per sf dir (StateStore), then every execution — including every
    // bench sample after the first — RELOADS the tables and pays only
    // state read + delta pass, which is what a production ingest loop
    // pays (state lives in tables between batches). This retires the r14
    // structural adjudication (state build inside the timer);
    // PersistedStateSpec pins reload→incremental bit-equal to
    // in-memory-state→incremental.
    //
    // Every ledger table is consumed as a PLAIN parquet scan — no
    // re-pinning. The r16 form localCheckpointed the three
    // multi-consumer tables (chunk_df/melted/shingles) per execution; the
    // r17 both-orders min-of-5 A/B (BenchAB probe_pinc/probe_pinc_r,
    // sf0.1) showed the re-cache LOSES to two pruned scans of slim
    // tables: plain {4.54, 5.05} s vs pinned {4.99, 5.12} s — and plain
    // is the production-faithful posture (state lives in tables; a
    // maintainer does not re-heap its ledger each batch). 4.54–5.05 s vs
    // the 2.66 s rebuild-oracle = 1.71–1.90×, under the 2× watch line;
    // the residual gap is structural — the oracle is a plain batch
    // rebuild at a scale where DuckDB's rebuild is cheap, while this
    // path pays state reads that only amortize when the state >> delta
    // (ScaleBench: 7.7 vs 40.1 CPU-s at a 1 % delta, 500 k docs).
    Q("pipeline_incremental",
      (s, dir) => {
        val docs = TableIO.read(s, dir, "documents")
        val b = TextOps.GopherBounds(minWords = 20, maxWords = 80)
        graft.ext.PipelineIncremental.curationPipelineIncremental(
          graft.ext.PipelineIncremental.fromFrames(curationStateLoad(s, dir, b)),
          docs.filter(col("doc_id") % 20 === 19),
          "doc_id", "text", "lang", "source", bounds = b)
      },
      Some(pipelineCensusOracle)),

    // Backfill ∘ X42c — the REPLAY face under the DuckDB gate (r16
    // verdict #6): a 3-batch `batch_<id>` history (doc_id % 3) replayed
    // cold through the streaming maintainer's foldBatch — the same
    // LedgerSwap transaction, watermark, and regime-gated arm choice the
    // live stream runs (batch 0 bootstraps via rebuild; 1 and 2 fold via
    // whichever arm the delta-regime audit advises) — then the run-ledger
    // census over the swapped state. The union of the batches is the
    // whole documents table, so the oracle is the SAME batch-census CTE
    // chain as pipeline_e2e: the hash match proves cold-start backfill ≡
    // batch rebuild at sf scale, on top of BackfillSpec's three-way
    // equality pins (incl. watermark-resume idempotence).
    Q("pipeline_backfill",
      (s, dir) => graft.run.StreamingCuration.census(
        s, backfillStateDir(s, dir, TextOps.GopherBounds(minWords = 20, maxWords = 80)),
        "doc_id", "lang"),
      Some(pipelineCensusOracle))
  )

  /** The batch curation-pipeline census mirror — shared by pipeline_e2e
   * (same input) and pipeline_incremental (whose input SPLITS the table
   * into corpus + delta; the union is the whole table, so the batch
   * mirror doubles as the rebuild oracle). */
  private lazy val pipelineCensusOracle: String = {
        val stop = Seq("the", "a", "of", "and", "to", "in", "is", "on")
          .map(x => s"'$x'").mkString(", ")
        val bands = (0 until Dedup.LshBands)
          .map(j => s"SELECT doc_id, $j AS band, ${OracleSql.bandKey(j)} AS bkey FROM k2")
          .mkString("\n  UNION ALL\n  ")
        s"""WITH tr AS (SELECT doc_id, text, lang FROM documents WHERE source <> 'src0'),
           |gsig AS (SELECT doc_id,
           |  CAST(len(w) AS BIGINT) AS n_words,
           |  round(CAST(list_sum(list_transform(w, x -> strlen(x))) AS DOUBLE)
           |        / CAST(len(w) AS DOUBLE), 6) AS mean_word_len,
           |  round(CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
           |        / CAST(len(w) AS DOUBLE), 6) AS frac_alpha,
           |  CAST(len(list_filter(w, x -> x IN ($stop))) AS BIGINT) AS n_stop,
           |  CASE WHEN len(w) > 0
           |       THEN round(1.0 - CAST(len(list_distinct(w)) AS DOUBLE)
           |                        / CAST(len(w) AS DOUBLE), 6)
           |       ELSE 0.0 END AS dup_frac
           |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM tr)),
           |k1 AS MATERIALIZED (SELECT tr.* FROM tr JOIN gsig USING (doc_id)
           |  WHERE NOT (n_words < 20 OR n_words > 80)
           |    AND NOT (mean_word_len < 3.0 OR mean_word_len > 10.0)
           |    AND frac_alpha >= 0.8 AND n_stop >= 2 AND dup_frac < 0.5),
           |t2 AS MATERIALIZED (SELECT doc_id, lang, string_split(text,' ') AS toks,
           |              CAST(len(string_split(text,' ')) AS BIGINT) AS n,
           |              ${OracleSql.chunks(8)} AS arr FROM k1),
           |ch AS (SELECT doc_id, unnest(range(0, len(arr))) AS idx, unnest(arr) AS chunk FROM t2),
           |cdf AS MATERIALIZED (SELECT chunk, count(*) AS cdf
           |        FROM (SELECT DISTINCT doc_id, chunk FROM ch) GROUP BY 1),
           |fl AS (SELECT ch.doc_id, ch.idx, cdf.cdf > 1 AS is_dup FROM ch JOIN cdf USING (chunk)),
           |kept AS MATERIALIZED (SELECT doc_id,
           |         array_agg(idx ORDER BY idx) FILTER (WHERE NOT is_dup) AS ki
           |         FROM fl GROUP BY 1),
           |k2 AS MATERIALIZED (SELECT t2.doc_id, t2.lang,
           |  coalesce(array_to_string(
           |    flatten(list_transform(coalesce(kept.ki, []), i -> t2.toks[i*8+1 : i*8+8]))
           |      || t2.toks[t2.n // 8 * 8 + 1 : t2.n], ' '), '') AS text,
           |  CAST(len(flatten(list_transform(coalesce(kept.ki, []), i -> t2.toks[i*8+1 : i*8+8])))
           |       + (t2.n - t2.n // 8 * 8) AS BIGINT) AS n_tok
           |  FROM t2 LEFT JOIN kept ON t2.doc_id = kept.doc_id
           |  WHERE CAST(len(flatten(list_transform(coalesce(kept.ki, []), i -> t2.toks[i*8+1 : i*8+8])))
           |       + (t2.n - t2.n // 8 * 8) AS BIGINT) > 0),
           |b AS (
           |  $bands),
           |sized AS (SELECT doc_id, band, bkey,
           |          count(*) OVER (PARTITION BY band, bkey) AS bsize FROM b),
           |capped AS (SELECT * FROM sized WHERE bsize <= 50),
           |pp AS (SELECT a.doc_id AS id_a, b2.doc_id AS id_b
           |       FROM capped a JOIN capped b2
           |         ON a.band = b2.band AND a.bkey = b2.bkey AND a.doc_id < b2.doc_id
           |       GROUP BY 1, 2),
           |sets AS MATERIALIZED (SELECT doc_id, list_distinct(${OracleSql.shingles}) AS sh FROM k2),
           |drops AS (SELECT DISTINCT id_b AS doc_id FROM pp
           |  JOIN sets sa ON sa.doc_id = id_a JOIN sets sb ON sb.doc_id = id_b
           |  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
           |          / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.5),
           |k3 AS MATERIALIZED (SELECT * FROM k2 WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
           |ev AS (SELECT DISTINCT unnest(${OracleSql.shingles}) AS sh
           |       FROM documents WHERE source = 'src0'),
           |cont AS (SELECT DISTINCT doc_id
           |         FROM (SELECT doc_id, unnest(${OracleSql.shingles}) AS sh FROM k3) tsh
           |         JOIN ev USING (sh)),
           |k4 AS MATERIALIZED (SELECT * FROM k3 WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
           |c5 AS (SELECT lang, count(*) AS n FROM k4 GROUP BY 1),
           |m5 AS (SELECT min(n) AS nmin FROM c5),
           |kp AS (SELECT lang, CAST(floor((1000000.0 * sqrt(CAST(nmin AS DOUBLE)))
           |                    / sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS keep_ppm
           |       FROM c5 CROSS JOIN m5),
           |k5 AS MATERIALIZED (SELECT k4.* FROM k4 JOIN kp USING (lang)
           |       WHERE (((((doc_id % 2147483648) + 2147483648) % 2147483648 * 2654435761)
           |               % 1000000 + 1000000) % 1000000) < keep_ppm),
           |p6 AS (SELECT lang, CAST(sum(n_tok) AS BIGINT) AS lt FROM k5 GROUP BY 1),
           |sq AS (SELECT CAST(coalesce(sum((lt + 511) // 512), 0) AS BIGINT) AS n_seqs FROM p6)
           |SELECT * FROM (
           |  SELECT 0 AS stage_idx, 'ingest' AS stage, (SELECT count(*) FROM tr) AS n_docs,
           |    (SELECT CAST(coalesce(sum(len(string_split(text,' '))), 0) AS BIGINT) FROM tr) AS n_tokens,
           |    CAST(0 AS BIGINT) AS n_seqs
           |  UNION ALL SELECT 1, 'gopher', (SELECT count(*) FROM k1),
           |    (SELECT CAST(coalesce(sum(len(string_split(text,' '))), 0) AS BIGINT) FROM k1), 0
           |  UNION ALL SELECT 2, 'span_dedup', (SELECT count(*) FROM k2),
           |    (SELECT CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM k2), 0
           |  UNION ALL SELECT 3, 'neardup_drop', (SELECT count(*) FROM k3),
           |    (SELECT CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM k3), 0
           |  UNION ALL SELECT 4, 'decontaminate', (SELECT count(*) FROM k4),
           |    (SELECT CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM k4), 0
           |  UNION ALL SELECT 5, 'temperature', (SELECT count(*) FROM k5),
           |    (SELECT CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM k5), 0
           |  UNION ALL SELECT 6, 'pack', (SELECT count(*) FROM k5),
           |    (SELECT CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM k5), (SELECT n_seqs FROM sq)
           |) ORDER BY stage_idx""".stripMargin
  }
}
