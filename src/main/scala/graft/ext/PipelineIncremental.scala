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
   * of the incremental's corpus-linear floor at 500 k docs). */
  case class CurationState(
      train0: DataFrame,         // (id, text, lang, n_raw_tokens): corpus train rows
      kept1: DataFrame,          // (id, text, lang, n_raw_tokens): Gopher survivors
      chunks: DataFrame,         // (id, __chunk) DISTINCT over kept1
      chunkDf: DataFrame,        // (__chunk, __ndc): distinct-doc frequency
      kept2: DataFrame,          // (id, text = rewritten, lang, n_kept_tokens), n > 0
      melted: DataFrame,         // (id, band, bkey): banded signature index over kept2
      verifiedTagged: DataFrame, // (id_a, id_b, band, bkey): verified pairs, bucket-tagged
      shingles: DataFrame,       // (id, sh) DISTINCT over kept2 text
      evalSh: DataFrame,         // (sh) DISTINCT: corpus eval docs' shingles
      contaminated: DataFrame)   // (id): kept2 docs sharing a shingle with evalSh

  /**
   * Build the stored state by curating `corpusDocs` with the same
   * parameters the batch pipeline uses. Every frame is staged (lazy
   * localCheckpoint) — in production each is a materialized table; here
   * the checkpoint models that and keeps the many state consumers from
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
    val kept2 = Dedup.spanRewrite(kept1, idCol, textCol, chunkSize, chunksIdx,
        chunkDf.filter(col("__ndc") > 1L).select(col("__chunk")))
      .filter(col("n_kept_tokens") > 0)
      .join(kept1.select(col(idCol), col(langCol)), Seq(idCol))
      .select(col(idCol), col("kept_text").as(textCol), col(langCol), col("n_kept_tokens"))
      .localCheckpoint(eager = false)

    // stage-3 ledger: banded index, bucket-tagged verified pairs under
    // corpus-level caps (== union-level caps for every bucket the
    // incremental pass will carry verbatim — see object doc)
    val bandCols = (0 until Dedup.LshBands).map(j => s"band$j")
    val melted = Dedup.withBandKeys(kept2, textCol, idCol)
      .select(col(idCol), posexplode(array(bandCols.map(col): _*)).as(Seq("band", "bkey")))
      .localCheckpoint(eager = false)
    val capped = HotKeys.dropOverCap(melted, Seq("band", "bkey"), bucketCap, stage = false)
    val tagged = capped.select(col(idCol).as("id_a"), col("band"), col("bkey"))
      .join(capped.select(col(idCol).as("id_b"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .localCheckpoint(eager = false)
    val sets = Dedup.withShingleHashes(kept2, textCol)
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
    val shingles = Dedup.withShingleHashes(kept2, textCol)
      .select(col(idCol), explode_outer(array_distinct(col(Dedup.ShinglesCol))).as("sh"))
      .filter(col("sh").isNotNull)
      .localCheckpoint(eager = false)
    val evalSh = Dedup.withShingleHashes(
        corpusDocs.filter(col(srcCol) === evalSource), textCol)
      .select(explode_outer(col(Dedup.ShinglesCol)).as("sh"))
      .filter(col("sh").isNotNull).distinct()
      .localCheckpoint(eager = false)
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
   * Curate `delta` against the stored `state` — same census schema and
   * BIT-EQUAL rows as `curationPipeline(corpus ∪ delta)`. See object doc
   * for the per-stage exactness argument; the equality itself is pinned
   * in PipelineIncrementalSpec (fixture corpora plus adversarial cases:
   * chunk-df flips, cap flips with resurrection, cross-batch drops of
   * unchanged docs, delta eval docs contaminating stored docs) and by
   * the `pipeline_incremental` oracle (the full batch CTE mirror over
   * the union).
   */
  def curationPipelineIncremental(state: CurationState, delta: DataFrame,
      idCol: String, textCol: String, langCol: String, srcCol: String,
      evalSource: String = "src0",
      stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on"),
      bounds: TextOps.GopherBounds = TextOps.GopherBounds(),
      chunkSize: Int = 8, minJaccard: Double = 0.5, bucketCap: Int = 50,
      seqLen: Long = 512L): DataFrame = {
    import Pipeline.{census, packCensus, rawTok}
    graft.ops.SqlTypes.requireFreeColumns(delta,
      Seq("n_kept_tokens", "kept_text", "keep", "sh", "n_raw_tokens", Dedup.ShinglesCol))

    val deltaTrain = delta.filter(col(srcCol) =!= evalSource)
      .select(col(idCol), col(textCol), col(langCol),
        rawTok(col(textCol)).as("n_raw_tokens"))
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
      .localCheckpoint(eager = false)
    val dfD = chunksD.select(col(idCol), col("__chunk")).distinct()
      .groupBy("__chunk").agg(count(lit(1)).as("__ndd"))
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
    val dupRW = rwKeys
      .join(state.chunkDf, Seq("__chunk"), "left_outer")
      .join(dfD, Seq("__chunk"), "left_outer")
      .filter(coalesce(col("__ndc"), lit(0L)) + coalesce(col("__ndd"), lit(0L)) >= 2L)
      .select(col("__chunk"))
    val k2d = Dedup.spanRewrite(rewriteSet, idCol, textCol, chunkSize, chunksRW, dupRW)
      .filter(col("n_kept_tokens") > 0)
      .join(rewriteSet.select(col(idCol), col(langCol)), Seq(idCol))
      .select(col(idCol), col("kept_text").as(textCol), col(langCol), col("n_kept_tokens"))
      .localCheckpoint(eager = false)
    // TEXT-SLIM survivor stream: from stage 3 on, unchanged docs are
    // represented by (id, lang, n_kept_tokens) only — their text is never
    // read again (pair verification uses the stored shingle index,
    // decontamination the stored verdicts), so the checkpoints stop
    // serializing the corpus text the batch pipeline has to carry
    val kept2 = state.kept2.join(t2, Seq(idCol), "left_anti")
      .select(col(idCol), col(langCol), col("n_kept_tokens"))
      .union(k2d.select(col(idCol), col(langCol), col("n_kept_tokens")))
      .localCheckpoint(eager = false)

    // 3 — near-dup: recompute TOUCHED buckets whole under union counts,
    // carry untouched buckets' verified pairs from the tagged ledger
    val bandCols = (0 until Dedup.LshBands).map(j => s"band$j")
    val bandsChanged = Dedup.withBandKeys(k2d, textCol, idCol)
      .select(col(idCol), posexplode(array(bandCols.map(col): _*)).as(Seq("band", "bkey")))
      .localCheckpoint(eager = false)
    val oldKeysT2 = state.melted.join(t2, Seq(idCol))
      .localCheckpoint(eager = false) // buckets LOSING a member are touched too
    val touchedKeys = bandsChanged.select("band", "bkey")
      .union(oldKeysT2.select("band", "bkey")).distinct()
      .localCheckpoint(eager = false)
    val meltedU = state.melted.join(t2, Seq(idCol), "left_anti").union(bandsChanged)
    val members = meltedU.join(touchedKeys, Seq("band", "bkey"))
    val cappedMembers = HotKeys.dropOverCap(members, Seq("band", "bkey"), bucketCap)
    val pairsTouched = cappedMembers.select(col(idCol).as("id_a"), col("band"), col("bkey"))
      .join(cappedMembers.select(col(idCol).as("id_b"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .localCheckpoint(eager = false)
    // shingle sets for the touched pairs' participants: fresh for
    // changed docs, from the stored shingle index for unchanged ones
    val pids = pairsTouched.select(col("id_a").as(idCol))
      .union(pairsTouched.select(col("id_b").as(idCol))).distinct()
      .localCheckpoint(eager = false)
    val changedIds = k2d.select(col(idCol))
    val setsChanged = Dedup.withShingleHashes(k2d, textCol)
      .select(col(idCol), array_distinct(col(Dedup.ShinglesCol)).as("__sh_set"))
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
    val pairsUntouched = state.verifiedTagged
      .join(touchedKeys, Seq("band", "bkey"), "left_anti")
      .select("id_a", "id_b")
    val drops = verifiedTouched.union(pairsUntouched)
      .select(col("id_b").as(idCol)).distinct()
    val kept3 = kept2.join(drops, Seq(idCol), "left_anti")
      .localCheckpoint(eager = false)

    // 4 — decontamination: stored verdicts for the stored eval set, a
    // probe of the stored shingle index against NEW eval shingles only,
    // and a fresh Bloom-prefiltered probe for changed/delta docs
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
    val contamChanged = Dedup.withShingleHashes(k2d, textCol)
      .select(col(idCol), explode_outer(col(Dedup.ShinglesCol)).as("sh"))
      .filter(col("sh").isNotNull)
      .filter(Bloom.mightContain(words, col("sh")))
      .join(evalShU, Seq("sh"))
      .select(col(idCol)).distinct()
    val contaminatedU = state.contaminated.join(t2, Seq(idCol), "left_anti")
      .union(contamNewUnchanged).union(contamChanged)
      .distinct()
    val kept4 = kept3.join(contaminatedU, Seq(idCol), "left_anti")
      .localCheckpoint(eager = false)

    // 5/6 — genuinely global but linear: stratum counts + ppm thresholds
    // (broadcast join), then the packing cumsum — same code as the batch
    val kept5 = Curation.temperatureAnnotate(kept4, langCol, col(idCol))
      .filter(col("keep"))
      .select(col(idCol), col(langCol), col("n_kept_tokens"))
      .localCheckpoint(eager = false)
    val packed = Curation.packSequences(kept5, idCol, langCol,
      col("n_kept_tokens"), seqLen)

    Seq(
      // token counts from the LEDGER column — no corpus re-tokenize
      census(0, "ingest", state.train0.union(deltaTrain), col("n_raw_tokens")),
      census(1, "gopher", state.kept1.union(k1d), col("n_raw_tokens")),
      census(2, "span_dedup", kept2, col("n_kept_tokens")),
      census(3, "neardup_drop", kept3, col("n_kept_tokens")),
      census(4, "decontaminate", kept4, col("n_kept_tokens")),
      census(5, "temperature", kept5, col("n_kept_tokens")),
      packCensus(kept5, packed, langCol)
    ).reduce(_ union _).orderBy("stage_idx")
  }
}
