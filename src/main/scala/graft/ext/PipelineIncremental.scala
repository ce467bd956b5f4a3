package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * X42b — the INCREMENTAL face of [[Pipeline.curationPipeline]]: the
 * production daily-ingest shape, where a delta batch is curated against
 * a STORED corpus without re-running the expensive kernels (chunk
 * hashing, shingling, minhash banding, Jaccard verification) over the
 * corpus, and without EVER joining the stored corpus against itself.
 * The output census is BIT-EQUAL to `curationPipeline(corpus ∪ delta)`
 * — the incremental-equals-rebuild proof pattern of the X36d
 * incremental kNN graph, extended to a six-stage composition.
 *
 * The stored state ([[CurationState]]) is what a production run would
 * materialize as ledger tables after curating the corpus: per-stage
 * survivor frames, the chunk document-frequency table, the banded
 * signature index, the bucket-tagged verified near-dup pairs, the
 * per-document shingle index, the eval shingle set, and the
 * contamination verdicts. Each incremental stage then recomputes ONLY
 * the delta-dependent slice; every join against state is delta-sided
 * (stored-table ⋈ small derived set). Where the rebuild's answer for a
 * corpus document can change, the affected set is derived exactly:
 *
 *  - stage 2 (span dedup): a chunk's dup status flips only 1 → ≥2
 *    (document frequencies grow monotonically under ingest), so the
 *    re-rewrite set T2 is exactly the corpus docs containing a chunk
 *    with stored df = 1 that the delta also contains.
 *  - stage 3 (near-dup): the candidate bucket space is partitioned into
 *    TOUCHED buckets (holding a delta/changed doc's new key, or a
 *    changed doc's OLD key — membership changed either way) and
 *    untouched ones. Untouched buckets have identical membership to
 *    state, hence identical union-level cap status and identical pairs
 *    — carried verbatim from the bucket-tagged stored pairs. Touched
 *    buckets are recomputed whole from the union index under UNION
 *    counts, which also handles cap FLIPS exactly: a bucket pushed over
 *    `bucketCap` by the delta drops whole (a previously-dropped corpus
 *    doc can legitimately RESURRECT), and a bucket whose changed-doc
 *    keys left may fall back under cap. Texts of unchanged docs are
 *    unchanged, so stored Jaccard verdicts remain valid for
 *    untouched-bucket pairs; pairs from touched buckets re-verify
 *    against the stored shingle index (unchanged side) and fresh
 *    shingles (changed side).
 *  - stage 4 (decontamination): the eval set can GROW (a delta batch
 *    may carry eval-source docs), so unchanged corpus docs are probed
 *    against the NEW eval shingles only (stored shingle index ⋈ small
 *    new-shingle set); their verdicts against the stored eval set come
 *    from the contamination ledger. Changed/delta docs probe the full
 *    union eval set behind the standard Bloom prefilter.
 *  - stages 5/6 (temperature, packing): genuinely global — stratum
 *    counts and pack offsets shift with every ingest — but linear,
 *    shuffle-light aggregates over the survivor frame (a broadcast
 *    ppm-threshold join and a two-level cumsum; no self-join), so they
 *    rerun as in the batch.
 *
 * The fold primitive is [[curationStateIncremental]]: state′ =
 * fold(state, batch) — every ledger frame updated delta-sided, each
 * frame bit-equal to `curationState(corpus ∪ batch)`'s, so the state
 * FOLDS batch to batch (the streaming maintainer in
 * [[graft.run.StreamingCuration]] applies exactly this fold per
 * micro-batch). The census then derives from the state alone
 * ([[censusFromState]] — one linear pass over the slim ledger, no text
 * re-processing); [[curationPipelineIncremental]] is the composition.
 *
 * PERSISTENCE: the ledger round-trips parquet via [[toFrames]] /
 * [[fromFrames]] (see [[graft.run.StateStore]]); the registered
 * `pipeline_incremental` query runs the delta pass over the RELOADED
 * tables — what production pays — and PersistedStateSpec pins
 * reload→incremental bit-equal to in-memory-state→incremental.
 *
 * Requires corpus and delta document ids to be disjoint (re-ingest of
 * an existing id is an upsert, not an append — out of scope here, as in
 * the X36d graph).
 */
object PipelineIncremental {

  /** The materialized curation ledger for a corpus — see object doc for
   * what each frame stores and why the incremental pass needs it.
   * `train0`/`kept1` carry the whitespace token count as a stored column
   * (`n_raw_tokens`) so the ingest-stage census is a sum over the ledger,
   * not a re-tokenize of the corpus (measured: the re-tokenize was most
   * of the incremental's corpus-linear floor at 500 k docs). `kept2` is
   * TEXT-SLIM (id, lang, n_kept_tokens): no consumer ever needs the
   * rewritten text again — pair verification reads the stored shingle
   * index, decontamination the stored verdicts, re-rewrites the kept1
   * text — so the ledger never persists the corpus text twice. */
  case class CurationState(
      train0: DataFrame,         // (id, text, lang, n_raw_tokens): corpus train rows
      kept1: DataFrame,          // (id, text, lang, n_raw_tokens): Gopher survivors
      chunks: DataFrame,         // (id, __chunk) DISTINCT over kept1
      chunkDf: DataFrame,        // (__chunk, __ndc): distinct-doc frequency
      kept2: DataFrame,          // (id, lang, n_kept_tokens): rewrite survivors, n > 0
      melted: DataFrame,         // (id, band, bkey): banded signature index over kept2 text
      verifiedTagged: DataFrame, // (id_a, id_b, band, bkey): verified pairs, bucket-tagged
      shingles: DataFrame,       // (id, sh) DISTINCT over kept2 text
      evalSh: DataFrame,         // (sh) DISTINCT: corpus eval docs' shingles
      contaminated: DataFrame)   // (id): kept2 docs sharing a shingle with evalSh

  /** Parquet table names for the persisted ledger, in [[toFrames]] order. */
  val FrameNames: Seq[String] = Seq("train0", "kept1", "chunks", "chunk_df",
    "kept2", "melted", "verified_tagged", "shingles", "eval_sh", "contaminated")

  /** The ledger as named frames — the write side of the parquet
   * round-trip ([[graft.run.StateStore.materialize]] persists each). */
  def toFrames(st: CurationState): Map[String, DataFrame] = Map(
    "train0" -> st.train0, "kept1" -> st.kept1, "chunks" -> st.chunks,
    "chunk_df" -> st.chunkDf, "kept2" -> st.kept2, "melted" -> st.melted,
    "verified_tagged" -> st.verifiedTagged, "shingles" -> st.shingles,
    "eval_sh" -> st.evalSh, "contaminated" -> st.contaminated)

  /** The read side: rebuild the ledger from a frame loader (reloaded
   * parquet tables, or any name → DataFrame mapping). */
  def fromFrames(load: String => DataFrame): CurationState = CurationState(
    train0 = load("train0"), kept1 = load("kept1"), chunks = load("chunks"),
    chunkDf = load("chunk_df"), kept2 = load("kept2"), melted = load("melted"),
    verifiedTagged = load("verified_tagged"), shingles = load("shingles"),
    evalSh = load("eval_sh"), contaminated = load("contaminated"))

  /**
   * Build the stored state by curating `corpusDocs` with the same
   * parameters the batch pipeline uses. Every frame is staged (lazy
   * localCheckpoint) — in production each is a materialized table
   * (persist via [[toFrames]] + [[graft.run.StateStore]]); the
   * checkpoint models that and keeps the many state consumers from
   * re-running the corpus kernels.
   */
  def curationState(corpusDocs: DataFrame, idCol: String, textCol: String,
      langCol: String, srcCol: String, evalSource: String = "src0",
      stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on"),
      bounds: TextOps.GopherBounds = TextOps.GopherBounds(),
      chunkSize: Int = 8, minJaccard: Double = 0.5, bucketCap: Int = 50): CurationState = {
    val train0 = corpusDocs.filter(col(srcCol) =!= evalSource)
      .select(col(idCol), col(textCol), col(langCol),
        Pipeline.rawTok(col(textCol)).as("n_raw_tokens"))
      .localCheckpoint(eager = false)
    val evalSh = Dedup.withShingleHashes(
        corpusDocs.filter(col(srcCol) === evalSource), textCol)
      .select(explode_outer(col(Dedup.ShinglesCol)).as("sh"))
      .filter(col("sh").isNotNull).distinct()
      .localCheckpoint(eager = false)
    curationStateFromLedgerInputs(train0, evalSh, idCol, textCol, langCol,
      stopwords, bounds, chunkSize, minJaccard, bucketCap)
  }

  /** [[curationState]] from the two LEDGER-SHAPED inputs — the train0
   * frame (id, text, lang, n_raw_tokens) and the distinct eval shingle
   * set — instead of raw documents. This is the REBUILD arm of the
   * streaming maintainer: both inputs are reconstructible from a stored
   * ledger plus a delta by plain unions (train0 rows and eval shingles
   * are append-only and delta-disjoint), so
   * `curationStateRebuild(state, delta)` ≡ `curationState(corpus ∪
   * delta)` without the ledger ever persisting eval TEXT. */
  private[graft] def curationStateFromLedgerInputs(train0In: DataFrame,
      evalShIn: DataFrame, idCol: String, textCol: String, langCol: String,
      stopwords: Seq[String], bounds: TextOps.GopherBounds,
      chunkSize: Int, minJaccard: Double, bucketCap: Int): CurationState = {
    val train0 = train0In
    val kept1 = train0
      .join(TextOps.gopherRules(train0, idCol, textCol, stopwords, bounds)
        .filter(col("passes")).select(col(idCol)), Seq(idCol))
      .localCheckpoint(eager = false)

    // stage-2 ledger: indexed chunk occurrences (staged once — feeds the
    // df table AND the rewrite), distinct per-doc chunk membership, df
    val chunksIdx = Dedup.chunkOccurrences(kept1, idCol, textCol, chunkSize)
      .localCheckpoint(eager = false)
    val chunks = chunksIdx.select(col(idCol), col("__chunk")).distinct()
      .localCheckpoint(eager = false)
    val chunkDf = chunks.groupBy("__chunk").agg(count(lit(1)).as("__ndc"))
      .localCheckpoint(eager = false)
    // full rewrite output (with text) feeds the band/shingle kernels
    // below; only the slim projection enters the stored ledger
    val k2full = Dedup.spanRewrite(kept1, idCol, textCol, chunkSize, chunksIdx,
        chunkDf.filter(col("__ndc") > 1L).select(col("__chunk")))
      .filter(col("n_kept_tokens") > 0)
      .join(kept1.select(col(idCol), col(langCol)), Seq(idCol))
      .select(col(idCol), col("kept_text").as(textCol), col(langCol), col("n_kept_tokens"))
      .localCheckpoint(eager = false)
    val kept2 = k2full.select(col(idCol), col(langCol), col("n_kept_tokens"))
      .localCheckpoint(eager = false)

    // stage-3 ledger: banded index, bucket-tagged verified pairs under
    // corpus-level caps (== union-level caps for every bucket the
    // incremental pass will carry verbatim — see object doc)
    val bandCols = (0 until Dedup.LshBands).map(j => s"band$j")
    val melted = Dedup.withBandKeys(k2full, textCol, idCol)
      .select(col(idCol), posexplode(array(bandCols.map(col): _*)).as(Seq("band", "bkey")))
      .localCheckpoint(eager = false)
    val capped = HotKeys.dropOverCap(melted, Seq("band", "bkey"), bucketCap, stage = false)
    val tagged = capped.select(col(idCol).as("id_a"), col("band"), col("bkey"))
      .join(capped.select(col(idCol).as("id_b"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .localCheckpoint(eager = false)
    val sets = Dedup.withShingleHashes(k2full, textCol)
      .select(col(idCol), array_distinct(col(Dedup.ShinglesCol)).as("__sh_set"))
    val verifiedPairs = tagged.select("id_a", "id_b").distinct()
      .join(sets.select(col(idCol).as("id_a"), col("__sh_set").as("__set_a")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("__sh_set").as("__set_b")), "id_b")
      .withColumn("__nc", size(array_intersect(col("__set_a"), col("__set_b"))).cast("long"))
      .filter(col("__nc").cast("double") /
        (size(col("__set_a")) + size(col("__set_b")) - col("__nc")).cast("double")
        >= minJaccard)
      .select("id_a", "id_b")
    val verifiedTagged = tagged.join(verifiedPairs, Seq("id_a", "id_b"))
      .select("id_a", "id_b", "band", "bkey")
      .localCheckpoint(eager = false)

    // stage-4 ledger: per-doc shingle index over the REWRITTEN text,
    // the eval shingle set, and contamination verdicts for ALL kept2
    // docs (not just stage-3 survivors — a dropped doc can resurrect
    // when a delta pushes its candidate bucket over cap)
    val shingles = Dedup.withShingleHashes(k2full, textCol)
      .select(col(idCol), explode_outer(array_distinct(col(Dedup.ShinglesCol))).as("sh"))
      .filter(col("sh").isNotNull)
      .localCheckpoint(eager = false)
    val evalSh = evalShIn
    val words = Bloom.buildWords(evalSh, "sh")
    val contaminated = shingles
      .filter(Bloom.mightContain(words, col("sh")))
      .join(evalSh, Seq("sh"))
      .select(col(idCol)).distinct()
      .localCheckpoint(eager = false)

    CurationState(train0, kept1, chunks, chunkDf, kept2, melted,
      verifiedTagged, shingles, evalSh, contaminated)
  }

  /**
   * The FOLD: ingest `delta` into `state`, returning the updated ledger —
   * every frame bit-equal to `curationState(corpus ∪ delta)`'s (pinned in
   * PersistedStateSpec frame by frame and, through the census, by the
   * `pipeline_incremental` oracle). See the object doc for the per-stage
   * exactness argument. All union frames are LAZY: a caller that only
   * derives the census ([[censusFromState]]) never executes the frames the
   * census doesn't read (chunks/chunkDf/melted/shingles/evalSh); a caller
   * persisting the full state (the streaming maintainer) executes each
   * exactly once into parquet.
   */
  /** The delta-proportional prefix shared by the fold and the
   * regime audit: stage-1/2 delta curation, the T2 re-rewrite set, the
   * changed docs' band keys, and the touched-bucket key set. */
  private case class DeltaFootprint(
      deltaTrain: DataFrame, k1d: DataFrame, chunksD: DataFrame,
      dfD: DataFrame, t2: DataFrame, k2d: DataFrame,
      bandsChanged: DataFrame, touchedKeys: DataFrame)

  private def deltaFootprint(state: CurationState, delta: DataFrame,
      idCol: String, textCol: String, langCol: String, srcCol: String,
      evalSource: String, stopwords: Seq[String], bounds: TextOps.GopherBounds,
      chunkSize: Int): DeltaFootprint = {
    graft.ops.SqlTypes.requireFreeColumns(delta,
      Seq("n_kept_tokens", "kept_text", "keep", "sh", "n_raw_tokens", Dedup.ShinglesCol))

    val deltaTrain = delta.filter(col(srcCol) =!= evalSource)
      .select(col(idCol), col(textCol), col(langCol),
        Pipeline.rawTok(col(textCol)).as("n_raw_tokens"))
      .localCheckpoint(eager = false)

    // 1 — Gopher is per-document: delta judged alone, corpus verdicts stored
    val k1d = deltaTrain
      .join(TextOps.gopherRules(deltaTrain, idCol, textCol, stopwords, bounds)
        .filter(col("passes")).select(col(idCol)), Seq(idCol))
      .localCheckpoint(eager = false)

    // 2 — span dedup: find the corpus docs whose rewrite CHANGES (T2 =
    // docs holding a chunk whose df flips 1 → ≥2), rewrite them plus the
    // delta under the UNION df, carry every other kept2 row verbatim
    val chunksD = Dedup.chunkOccurrences(k1d, idCol, textCol, chunkSize)
      .select(col(idCol), col("__chunk")).distinct()
      .localCheckpoint(eager = false)
    val dfD = chunksD.groupBy("__chunk").agg(count(lit(1)).as("__ndd"))
      .localCheckpoint(eager = false)
    val flipped = state.chunkDf.filter(col("__ndc") === 1L)
      .join(dfD.select(col("__chunk")), Seq("__chunk"))
      .select(col("__chunk"))
    val t2 = state.chunks.join(flipped, Seq("__chunk"))
      .select(col(idCol)).distinct()
      .localCheckpoint(eager = false)
    val rewriteSet = k1d.union(state.kept1.join(t2, Seq(idCol)))
      .localCheckpoint(eager = false)
    // union-level dup status, restricted to the rewrite set's chunks:
    // dup iff stored corpus df + delta df >= 2
    val chunksRW = Dedup.chunkOccurrences(rewriteSet, idCol, textCol, chunkSize)
      .localCheckpoint(eager = false)
    val rwKeys = chunksRW.select(col("__chunk")).distinct()
      .localCheckpoint(eager = false)
    // prune the stored df table to the rewrite set's chunks with an INNER
    // join first (AQE broadcasts the small rwKeys side — exchange-free
    // scan of the big table); the outer joins then run between
    // delta-proportional frames only. The r14 shape left_outer-joined
    // rwKeys against the WHOLE stored df table — a join no planner can
    // broadcast (big frame on the preserved-null side), so the stored
    // table paid a full sort exchange per batch.
    val ndcRW = state.chunkDf.join(rwKeys, Seq("__chunk"))
    val dupRW = rwKeys
      .join(ndcRW, Seq("__chunk"), "left_outer")
      .join(dfD, Seq("__chunk"), "left_outer")
      .filter(coalesce(col("__ndc"), lit(0L)) + coalesce(col("__ndd"), lit(0L)) >= 2L)
      .select(col("__chunk"))
    val k2d = Dedup.spanRewrite(rewriteSet, idCol, textCol, chunkSize, chunksRW, dupRW)
      .filter(col("n_kept_tokens") > 0)
      .join(rewriteSet.select(col(idCol), col(langCol)), Seq(idCol))
      .select(col(idCol), col("kept_text").as(textCol), col(langCol), col("n_kept_tokens"))
      .localCheckpoint(eager = false)

    // changed docs' band keys + the touched-bucket partition of stage 3
    val bandCols = (0 until Dedup.LshBands).map(j => s"band$j")
    val bandsChanged = Dedup.withBandKeys(k2d, textCol, idCol)
      .select(col(idCol), posexplode(array(bandCols.map(col): _*)).as(Seq("band", "bkey")))
      .localCheckpoint(eager = false)
    // buckets LOSING a member are touched too; single consumer, so no
    // checkpoint — under AQE every localCheckpoint(eager = false) BLOCKS
    // at construction while its non-result stages materialize (measured
    // r19, BenchAB probe_pjobs: the fold's checkpoints ran 70 sequential
    // jobs / ~5.5 s before the census action even started), so staging is
    // reserved for genuinely multi-consumer frames
    val oldKeysT2 = state.melted.join(t2, Seq(idCol))
    val touchedKeys = bandsChanged.select("band", "bkey")
      .union(oldKeysT2.select("band", "bkey")).distinct()
      .localCheckpoint(eager = false)
    DeltaFootprint(deltaTrain, k1d, chunksD, dfD, t2, k2d, bandsChanged, touchedKeys)
  }

  /** The REBUILD arm over a stored ledger + delta: reconstruct the two
   * ledger-shaped inputs by union (train0 rows and eval shingles are
   * append-only and delta-disjoint, so the unions ARE the union corpus's
   * inputs) and re-run the full batch build. Equal to
   * `curationState(corpus ∪ delta)` frame by frame — the arm a
   * maintainer takes when [[deltaRegimeAudit]] advises that the delta is
   * diffuse enough that the incremental fold would cost ≈ rebuild
   * through a slower path. */
  def curationStateRebuild(state: CurationState, delta: DataFrame,
      idCol: String, textCol: String, langCol: String, srcCol: String,
      evalSource: String = "src0",
      stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on"),
      bounds: TextOps.GopherBounds = TextOps.GopherBounds(),
      chunkSize: Int = 8, minJaccard: Double = 0.5, bucketCap: Int = 50): CurationState = {
    val deltaTrain0 = delta.filter(col(srcCol) =!= evalSource)
      .select(col(idCol), col(textCol), col(langCol),
        Pipeline.rawTok(col(textCol)).as("n_raw_tokens"))
    val deltaEvalSh = Dedup.withShingleHashes(
        delta.filter(col(srcCol) === evalSource), textCol)
      .select(explode_outer(col(Dedup.ShinglesCol)).as("sh"))
      .filter(col("sh").isNotNull)
    curationStateFromLedgerInputs(
      state.train0.unionByName(deltaTrain0).localCheckpoint(eager = false),
      state.evalSh.unionByName(deltaEvalSh).distinct().localCheckpoint(eager = false),
      idCol, textCol, langCol, stopwords, bounds, chunkSize, minJaccard, bucketCap)
  }

  def curationStateIncremental(state: CurationState, delta: DataFrame,
      idCol: String, textCol: String, langCol: String, srcCol: String,
      evalSource: String = "src0",
      stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on"),
      bounds: TextOps.GopherBounds = TextOps.GopherBounds(),
      chunkSize: Int = 8, minJaccard: Double = 0.5, bucketCap: Int = 50): CurationState = {
    val fp = deltaFootprint(state, delta, idCol, textCol, langCol, srcCol,
      evalSource, stopwords, bounds, chunkSize)
    val DeltaFootprint(deltaTrain, k1d, chunksD, dfD, t2, k2d, bandsChanged, touchedKeys) = fp

    // TEXT-SLIM survivor stream: from stage 3 on, unchanged docs are
    // represented by (id, lang, n_kept_tokens) only — their text is never
    // read again (pair verification uses the stored shingle index,
    // decontamination the stored verdicts), so neither the checkpoints
    // nor the persisted ledger ever serialize the corpus text twice
    // OUTPUT frames are returned UN-checkpointed (r19): every output
    // frame is single-consumer downstream — the census reads five of
    // them exactly once, the streaming maintainer writes each to parquet
    // exactly once — so a checkpoint buys no reuse, while its
    // construction-time AQE materialization forced even the frames the
    // census never reads (chunks/chunkDf/melted/shingles) to execute
    // their map stages inside the timed path. Fold INTERNALS (t2, k2d,
    // shinglesD, …) stay checkpointed: they are genuinely multi-consumer.
    val kept2 = state.kept2.join(t2, Seq(idCol), "left_anti")
      .union(k2d.select(col(idCol), col(langCol), col("n_kept_tokens")))

    // 3 — near-dup: recompute TOUCHED buckets whole under union counts,
    // carry untouched buckets' verified pairs from the tagged ledger
    val meltedU = state.melted.join(t2, Seq(idCol), "left_anti").union(bandsChanged)
    val members = meltedU.join(touchedKeys, Seq("band", "bkey"))
    val cappedMembers = HotKeys.dropOverCap(members, Seq("band", "bkey"), bucketCap)
    // touched-bucket candidate pairs, TAGGED (the state carries tags so
    // the next fold can carry/invalidate per bucket)
    val taggedTouched = cappedMembers.select(col(idCol).as("id_a"), col("band"), col("bkey"))
      .join(cappedMembers.select(col(idCol).as("id_b"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .localCheckpoint(eager = false)
    val pairsTouched = taggedTouched.select("id_a", "id_b").distinct()
      .localCheckpoint(eager = false)
    // shingle sets for the touched pairs' participants: fresh for
    // changed docs, from the stored shingle index for unchanged ones
    val pids = pairsTouched.select(col("id_a").as(idCol))
      .union(pairsTouched.select(col("id_b").as(idCol))).distinct()
      .localCheckpoint(eager = false)
    val changedIds = k2d.select(col(idCol))
    // changed docs' shingle index, staged ONCE: feeds the verification
    // sets here AND the stage-4 shingle-ledger union / contamination
    // probe below (one shingle-kernel pass over k2d, not three)
    val shinglesD = Dedup.withShingleHashes(k2d, textCol)
      .select(col(idCol), explode_outer(array_distinct(col(Dedup.ShinglesCol))).as("sh"))
      .filter(col("sh").isNotNull)
      .localCheckpoint(eager = false)
    // collect_list order is nondeterministic but the Jaccard below is
    // set-algebraic (array_intersect + size) — order-insensitive
    val setsChanged = shinglesD
      .groupBy(idCol).agg(collect_list(col("sh")).as("__sh_set"))
    val setsUnchanged = state.shingles
      .join(pids.join(changedIds, Seq(idCol), "left_anti"), Seq(idCol))
      .groupBy(idCol).agg(collect_list(col("sh")).as("__sh_set"))
    val sets = setsChanged.union(setsUnchanged).localCheckpoint(eager = false)
    val verifiedTouched = pairsTouched
      .join(sets.select(col(idCol).as("id_a"), col("__sh_set").as("__set_a")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("__sh_set").as("__set_b")), "id_b")
      .withColumn("__nc", size(array_intersect(col("__set_a"), col("__set_b"))).cast("long"))
      .filter(col("__nc").cast("double") /
        (size(col("__set_a")) + size(col("__set_b")) - col("__nc")).cast("double")
        >= minJaccard)
      .select("id_a", "id_b")
      .localCheckpoint(eager = false)
    // explicit re-select on BOTH union arms: a USING-column anti-join
    // reorders the join columns first, and union aligns positionally
    val verifiedTagged = state.verifiedTagged
      .join(touchedKeys, Seq("band", "bkey"), "left_anti")
      .select("id_a", "id_b", "band", "bkey")
      .union(taggedTouched.join(verifiedTouched, Seq("id_a", "id_b"))
        .select("id_a", "id_b", "band", "bkey"))
      .localCheckpoint(eager = false)

    // 4 — decontamination: stored verdicts for the stored eval set, a
    // probe of the stored shingle index against NEW eval shingles only,
    // and a fresh Bloom-prefiltered probe for changed/delta docs
    // (shinglesD staged in stage 3 above)
    val shingles = state.shingles.join(t2, Seq(idCol), "left_anti").union(shinglesD)
    val evalShD = Dedup.withShingleHashes(
        delta.filter(col(srcCol) === evalSource), textCol)
      .select(explode_outer(col(Dedup.ShinglesCol)).as("sh"))
      .filter(col("sh").isNotNull).distinct()
      .localCheckpoint(eager = false)
    val evalShU = state.evalSh.union(evalShD).distinct().localCheckpoint(eager = false)
    val newEvalSh = evalShD.join(state.evalSh, Seq("sh"), "left_anti")
    // STALENESS GUARD: the stored shingle index and contamination
    // verdicts describe the CORPUS-rewrite text — for T2 docs the union
    // rewrite changed it (a contaminating chunk can be rewritten away),
    // so both stored paths exclude T2; changed docs are probed fresh
    // below. (Caught by the sf0.01 oracle: carrying a T2 doc's stale
    // verdict over-dropped docs the rebuild keeps.)
    val contamNewUnchanged = state.shingles.join(t2, Seq(idCol), "left_anti")
      .join(newEvalSh, Seq("sh"))
      .select(col(idCol)).distinct()
    val words = Bloom.buildWords(evalShU, "sh")
    val contamChanged = shinglesD
      .filter(Bloom.mightContain(words, col("sh")))
      .join(evalShU, Seq("sh"))
      .select(col(idCol)).distinct()
    val contaminated = state.contaminated.join(t2, Seq(idCol), "left_anti")
      .union(contamNewUnchanged).union(contamChanged)
      .distinct()
      .localCheckpoint(eager = false)

    CurationState(
      train0 = state.train0.union(deltaTrain).localCheckpoint(eager = false),
      kept1 = state.kept1.union(k1d).localCheckpoint(eager = false),
      chunks = state.chunks.union(chunksD).localCheckpoint(eager = false),
      // df folds additively: corpus and delta ids are disjoint, so the
      // union's distinct-doc count per chunk is the plain sum
      chunkDf = state.chunkDf
        .union(dfD.select(col("__chunk"), col("__ndd").as("__ndc")))
        .groupBy("__chunk").agg(sum("__ndc").as("__ndc"))
        .localCheckpoint(eager = false),
      kept2 = kept2,
      melted = meltedU.localCheckpoint(eager = false),
      verifiedTagged = verifiedTagged,
      shingles = shingles.localCheckpoint(eager = false),
      evalSh = evalShU,
      contaminated = contaminated)
  }

  /**
   * DELTA-REGIME AUDIT — makes the measured uniform-vs-localized cost
   * boundary (SCALING.md r14: a UNIFORM 1 % delta touches ~60 % of the
   * candidate buckets and costs ≈ a full rebuild, while a localized
   * ingest batch runs 7.7× under it) visible to the CALLER, not only to
   * record readers: one row with the delta's touched-bucket footprint,
   * so a production ingest loop can route a diffuse batch to the batch
   * rebuild instead of paying rebuild cost through the incremental path.
   * The verdict column applies `rebuildThresholdPpm` to the touched
   * fraction; the threshold default sits well under the measured ≈60 %
   * break-even so the advice flips before the cost does.
   *
   * Same inputs as the fold; shares its delta-footprint computation
   * (stage-1/2 delta curation → T2 → changed band keys → touched keys),
   * so auditing before folding costs one extra linear key count, not a
   * second delta pass.
   */
  def deltaRegimeAudit(state: CurationState, delta: DataFrame,
      idCol: String, textCol: String, langCol: String, srcCol: String,
      evalSource: String = "src0",
      stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on"),
      bounds: TextOps.GopherBounds = TextOps.GopherBounds(),
      chunkSize: Int = 8, rebuildThresholdPpm: Long = 250000L): DataFrame = {
    val fp = deltaFootprint(state, delta, idCol, textCol, langCol, srcCol,
      evalSource, stopwords, bounds, chunkSize)
    // union index keys = stored keys of unchanged docs + changed docs'
    // new keys (identical to the fold's meltedU)
    val unionKeys = state.melted.join(fp.t2, Seq(idCol), "left_anti")
      .select("band", "bkey")
      .union(fp.bandsChanged.select("band", "bkey"))
      .distinct()
    fp.deltaTrain.agg(count(lit(1)).as("n_delta_docs"))
      .crossJoin(broadcast(fp.t2.agg(count(lit(1)).as("n_t2_docs"))))
      .crossJoin(broadcast(fp.touchedKeys.agg(count(lit(1)).as("n_touched_buckets"))))
      .crossJoin(broadcast(unionKeys.agg(count(lit(1)).as("n_total_buckets"))))
      .select(col("n_delta_docs"), col("n_t2_docs"),
        col("n_touched_buckets"), col("n_total_buckets"),
        expr("(n_touched_buckets * 1000000) div greatest(n_total_buckets, 1)")
          .as("touched_ppm"))
      .withColumn("advise_rebuild", col("touched_ppm") >= rebuildThresholdPpm)
  }

  /**
   * The per-stage census derived from a ledger alone — one linear pass
   * over the slim state frames (never the corpus text): drops from the
   * verified-pair ledger, quarantine from the contamination ledger, then
   * the global-but-linear temperature threshold and packing cumsum. For
   * `state = curationState(docs)` this equals `curationPipeline(docs)`'s
   * census by construction (same frames, same aggregates).
   */
  def censusFromState(state: CurationState, idCol: String, langCol: String,
      seqLen: Long = 512L): DataFrame = {
    import Pipeline.census
    val drops = state.verifiedTagged.select(col("id_b").as(idCol)).distinct()
    // ONE flagged pass over the kept2 ledger replaces the r17 chained
    // kept3/kept4 anti-join checkpoints (r18, guide §2.4): per-row
    // drop/contamination flags via left_outer marker joins (ids are
    // unique on every side, so row counts are preserved), then census
    // rows 2/3/4 fall out of a SINGLE conditional aggregate + stack
    // instead of three aggregate passes over three chained frames. The
    // decomposition probe (BenchAB probe_pdecomp) measured the census
    // tail alone at 1.87 s of pipeline_incremental's wall; at scale
    // this is 3 survivor-ledger passes where r17 paid ~8.
    val flagged = state.kept2
      .join(drops.withColumn("__dropped", lit(true)), Seq(idCol), "left_outer")
      .join(state.contaminated.select(col(idCol)).withColumn("__cont", lit(true)),
        Seq(idCol), "left_outer")
      .select(col(idCol), col(langCol), col("n_kept_tokens"),
        col("__dropped").isNull.as("__k3"),
        (col("__dropped").isNull && col("__cont").isNull).as("__k4"))
      .localCheckpoint(eager = false)
    val rows234 = flagged
      .agg(
        count(lit(1)).as("n2"),
        coalesce(sum(col("n_kept_tokens")), lit(0L)).as("t2"),
        count(when(col("__k3"), 1)).as("n3"),
        coalesce(sum(when(col("__k3"), col("n_kept_tokens"))), lit(0L)).as("t3"),
        count(when(col("__k4"), 1)).as("n4"),
        coalesce(sum(when(col("__k4"), col("n_kept_tokens"))), lit(0L)).as("t4"))
      .select(expr(
        "stack(3, 2, 'span_dedup', n2, t2, 3, 'neardup_drop', n3, t3, " +
          "4, 'decontaminate', n4, t4)")
        .as(Seq("stage_idx", "stage", "n_docs", "n_tokens")))
      .withColumn("n_seqs", lit(0L))
    // kept4 = the flagged rows themselves (same rows the anti-join form
    // produced); the temperature stage is unchanged — its stratum counts
    // and keep rule need kept4 materialized first either way
    val kept5 = Curation.temperatureAnnotate(
        flagged.filter(col("__k4"))
          .select(col(idCol), col(langCol), col("n_kept_tokens")),
        langCol, col(idCol))
      .filter(col("keep"))
      .select(col(idCol), col(langCol), col("n_kept_tokens"))
    // pack census ARITHMETICALLY: the survivors' sequence count per
    // stratum is ceil(Σ tokens / seqLen) — identical to what the last
    // packed doc's first_seq + n_seqs evaluates to (every kept5 doc has
    // n_kept_tokens > 0), so running the real packSequences range
    // exchange + window machinery here would buy bit-nothing. The
    // packing OPERATOR composition stays proven by pipeline_e2e, which
    // derives this row from the genuine packSequences output; equality
    // of the two forms is exactly what the shared oracle hash checks.
    // Census rows 5 and 6 come out of the SAME per-stratum aggregate
    // (one kept5 pass, not three): totals are sums of the per-lang
    // counts, and the integer ceil-div (never double ceil — precision
    // dies past 2^53) folds per stratum exactly as before.
    val rows56 = kept5.groupBy(col(langCol))
      .agg(count(lit(1)).as("__nd"),
        coalesce(sum(col("n_kept_tokens")), lit(0L)).as("__lt"))
      .agg(
        coalesce(sum("__nd"), lit(0L)).as("n5"),
        coalesce(sum("__lt"), lit(0L)).as("t5"),
        coalesce(sum(expr(s"(__lt + ${seqLen - 1}) div $seqLen")), lit(0L)).as("s6"))
      .select(expr("stack(2, 5, 'temperature', n5, t5, CAST(0 AS BIGINT), " +
          "6, 'pack', n5, t5, s6)")
        .as(Seq("stage_idx", "stage", "n_docs", "n_tokens", "n_seqs")))
    Seq(
      // token counts from the LEDGER column — no corpus re-tokenize
      census(0, "ingest", state.train0, col("n_raw_tokens")),
      census(1, "gopher", state.kept1, col("n_raw_tokens")),
      rows234,
      rows56
    ).reduce(_ unionByName _).orderBy("stage_idx")
  }

  /**
   * Curate `delta` against the stored `state` — same census schema and
   * BIT-EQUAL rows as `curationPipeline(corpus ∪ delta)`: the
   * [[curationStateIncremental]] fold followed by [[censusFromState]].
   * The state frames the census never reads (chunks, chunkDf, melted,
   * shingles, evalSh unions) stay unexecuted — this path costs exactly
   * the delta pass. The equality is pinned in PipelineIncrementalSpec
   * (fixture corpora plus adversarial cases: chunk-df flips, cap flips
   * with resurrection, cross-batch drops of unchanged docs, delta eval
   * docs contaminating stored docs) and by the `pipeline_incremental`
   * oracle (the full batch CTE mirror over the union).
   */
  def curationPipelineIncremental(state: CurationState, delta: DataFrame,
      idCol: String, textCol: String, langCol: String, srcCol: String,
      evalSource: String = "src0",
      stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on"),
      bounds: TextOps.GopherBounds = TextOps.GopherBounds(),
      chunkSize: Int = 8, minJaccard: Double = 0.5, bucketCap: Int = 50,
      seqLen: Long = 512L): DataFrame =
    censusFromState(
      curationStateIncremental(state, delta, idCol, textCol, langCol, srcCol,
        evalSource, stopwords, bounds, chunkSize, minJaccard, bucketCap),
      idCol, langCol, seqLen)
}
