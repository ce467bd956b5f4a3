package graft.ext

import graft.SparkSpec
import graft.io.TableIO
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Incremental-equals-rebuild proof for the X42b incremental curation
 * pipeline: `curationPipelineIncremental(curationState(corpus), delta)`
 * must be BIT-EQUAL to `curationPipeline(corpus ∪ delta)` — on the
 * fixture corpus AND on adversarial cases engineered to fire each
 * cross-batch interaction the incremental recompute sets must cover:
 *
 *  - a delta doc flips a corpus chunk's df 1 → 2 (T2 re-rewrite)
 *  - a delta doc near-dups an UNCHANGED corpus doc into a drop
 *  - a delta pushes a candidate bucket over cap, RESURRECTING corpus
 *    docs the state had dropped
 *  - a delta EVAL doc's new shingles contaminate an unchanged corpus doc
 *
 * Each adversarial test also asserts the scenario actually fires (the
 * union census differs from the sum of independent corpus/delta runs at
 * the relevant stage) — equality on a scenario that never exercised the
 * cross-batch path would prove nothing.
 */
class PipelineIncrementalSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.types._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType)))

  private def docsDf(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(rows.asJava, schema)

  /** stage_idx -> (n_docs, n_tokens, n_seqs) */
  private def censusMap(df: DataFrame): Map[Int, (Long, Long, Long)] =
    df.collect().map(r => r.getInt(0) ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_seqs"))).toMap

  private def runBoth(corpus: DataFrame, delta: DataFrame,
      bounds: TextOps.GopherBounds, bucketCap: Int = 50)
      : (Map[Int, (Long, Long, Long)], Map[Int, (Long, Long, Long)]) = {
    val batch = Pipeline.curationPipeline(corpus.union(delta),
      "doc_id", "text", "lang", "source", bounds = bounds, bucketCap = bucketCap)
    val st = PipelineIncremental.curationState(corpus,
      "doc_id", "text", "lang", "source", bounds = bounds, bucketCap = bucketCap)
    val inc = PipelineIncremental.curationPipelineIncremental(st, delta,
      "doc_id", "text", "lang", "source", bounds = bounds, bucketCap = bucketCap)
    (censusMap(batch), censusMap(inc))
  }

  private def sumAt(a: Map[Int, (Long, Long, Long)], b: Map[Int, (Long, Long, Long)],
      idx: Int): (Long, Long) =
    (a(idx)._1 + b(idx)._1, a(idx)._2 + b(idx)._2)

  // 30 distinct alphabetic words incl. 2 stopwords, mean len in bounds
  private def words(seed: Int, n: Int = 30): Seq[String] =
    Seq("the", "a") ++ (0 until n - 2).map(i => s"word${('a' + (seed + i) % 26).toChar}${"x" * (i % 4)}q$i")

  private val Bounds = TextOps.GopherBounds(minWords = 10, maxWords = 200)

  test("fixture corpus: incremental census == batch rebuild census") {
    val docs = TableIO.read(spark, Sf, "documents")
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    val delta = docs.filter(col("doc_id") % 5 === 4)
    val b = TextOps.GopherBounds(minWords = 20, maxWords = 80)
    val batch = censusMap(Pipeline.curationPipeline(docs,
      "doc_id", "text", "lang", "source", bounds = b))
    val st = PipelineIncremental.curationState(corpus,
      "doc_id", "text", "lang", "source", bounds = b)
    val inc = censusMap(PipelineIncremental.curationPipelineIncremental(st, delta,
      "doc_id", "text", "lang", "source", bounds = b))
    assert(inc == batch, s"fixture census diverged:\n inc   $inc\n batch $batch")
  }

  test("chunk-df flip: delta doc flips a corpus chunk to dup, corpus doc re-rewrites") {
    // corpus doc 100 and delta doc 1 share their FIRST 8-token chunk;
    // the rest differs enough to stay under the 0.5-Jaccard near-dup bar
    val shared = (0 until 8).map(i => s"sharedchunk$i")
    val corpus = docsDf(Seq(
      Row(100L, (shared ++ words(0)).mkString(" "), "en", "src1"),
      Row(101L, words(5).mkString(" "), "en", "src1")))
    val delta = docsDf(Seq(
      Row(1L, (shared ++ words(13)).mkString(" "), "en", "src1")))
    val (batch, inc) = runBoth(corpus, delta, Bounds)
    assert(inc == batch, s"chunk-flip census diverged:\n inc   $inc\n batch $batch")
    // the scenario fired: union stage-2 tokens < corpus-alone + delta-alone
    // (the shared chunk is only dup when the batches meet)
    val cAlone = censusMap(Pipeline.curationPipeline(corpus,
      "doc_id", "text", "lang", "source", bounds = Bounds))
    val dAlone = censusMap(Pipeline.curationPipeline(delta,
      "doc_id", "text", "lang", "source", bounds = Bounds))
    assert(batch(2)._2 < sumAt(cAlone, dAlone, 2)._2,
      "chunk flip never fired — the shared chunk was not deduplicated cross-batch")
  }

  test("cross-batch near-dup: a smaller-id delta doc drops an unchanged corpus doc") {
    val base = words(0, 40)
    val corpus = docsDf(Seq(
      Row(100L, base.mkString(" "), "en", "src1"),
      Row(101L, words(7).mkString(" "), "en", "src1")))
    // delta id 1 < 100 and near-identical text: pair (1, 100) verifies,
    // drop rule removes id_b = 100 — an UNCHANGED corpus doc
    val delta = docsDf(Seq(
      Row(1L, base.updated(39, "changedtail").mkString(" "), "en", "src1")))
    val (batch, inc) = runBoth(corpus, delta, Bounds)
    assert(inc == batch, s"cross-drop census diverged:\n inc   $inc\n batch $batch")
    val cAlone = censusMap(Pipeline.curationPipeline(corpus,
      "doc_id", "text", "lang", "source", bounds = Bounds))
    val dAlone = censusMap(Pipeline.curationPipeline(delta,
      "doc_id", "text", "lang", "source", bounds = Bounds))
    assert(batch(3)._1 < sumAt(cAlone, dAlone, 3)._1,
      "cross-batch near-dup drop never fired")
  }

  test("cap flip: delta pushes the bucket over cap, state-dropped corpus docs resurrect") {
    // 3 identical corpus docs: bucket size 3 <= cap 3 -> pairs verify,
    // ids 101,102 drop in the corpus state. Delta adds 2 more copies:
    // union bucket size 5 > 3 -> dropped whole, NO pairs, no drops.
    // 44 tokens = 5 full chunks + a 4-token tail: the identical chunks
    // are all cross-doc dups and rewrite away at stage 2, but the tail
    // survives verbatim — so every copy reaches stage 3 with the SAME
    // 4-token kept text (identical band keys, one shared bucket).
    val txt = words(3, 44).mkString(" ")
    val corpus = docsDf(Seq(
      Row(100L, txt, "en", "src1"), Row(101L, txt, "en", "src1"),
      Row(102L, txt, "en", "src1"),
      Row(110L, words(9).mkString(" "), "en", "src1")))
    val delta = docsDf(Seq(
      Row(1L, txt, "en", "src1"), Row(2L, txt, "en", "src1")))
    val (batch, inc) = runBoth(corpus, delta, Bounds, bucketCap = 3)
    assert(inc == batch, s"cap-flip census diverged:\n inc   $inc\n batch $batch")
    // fired: corpus alone drops 2 docs at stage 3, union drops none
    val cAlone = censusMap(Pipeline.curationPipeline(corpus,
      "doc_id", "text", "lang", "source", bounds = Bounds, bucketCap = 3))
    assert(cAlone(2)._1 - cAlone(3)._1 == 2L,
      s"corpus state should drop 2 near-dups, dropped ${cAlone(2)._1 - cAlone(3)._1}")
    assert(batch(2)._1 - batch(3)._1 == 0L,
      s"union should drop none (bucket over cap), dropped ${batch(2)._1 - batch(3)._1}")
  }

  test("delta eval doc contaminates an UNCHANGED corpus doc") {
    val poison = Seq("zulux", "yankeex", "xrayx") // a 3-gram shingle
    val corpus = docsDf(Seq(
      Row(100L, (words(0) ++ poison).mkString(" "), "en", "src1"),
      Row(101L, words(11).mkString(" "), "en", "src1"),
      // corpus eval doc, so the stored eval set is non-empty
      Row(900L, words(21).mkString(" "), "en", "src0")))
    val delta = docsDf(Seq(
      Row(1L, (words(17) ++ poison).mkString(" "), "en", "src0"))) // EVAL source
    val (batch, inc) = runBoth(corpus, delta, Bounds)
    assert(inc == batch, s"eval-growth census diverged:\n inc   $inc\n batch $batch")
    // fired: without the delta, doc 100 survives decontamination
    val cAlone = censusMap(Pipeline.curationPipeline(corpus,
      "doc_id", "text", "lang", "source", bounds = Bounds))
    assert(cAlone(3)._1 - cAlone(4)._1 == 0L, "corpus-alone should have no contamination")
    assert(batch(3)._1 - batch(4)._1 >= 1L,
      "delta eval shingles should contaminate the stored corpus doc")
  }

  test("stale contamination verdict: a T2 re-rewrite removes the contaminating chunk") {
    // corpus doc 100's poison 3-gram sits MID-CHUNK in its first 8-token
    // chunk; the corpus eval doc shares the 3-gram, so the STORED verdict
    // marks 100 contaminated. The delta doc shares that exact chunk,
    // flipping its df to 2 — the union rewrite removes the chunk, the
    // poison disappears, and the rebuild KEEPS doc 100. An incremental
    // pass that carries the stale stored verdict over-drops it.
    val poison = Seq("zulux", "yankeex", "xrayx")
    val chunk = Seq("cpadq", "cpbdq") ++ poison ++ Seq("cpcdq", "cpddq", "cpedq")
    val corpus = docsDf(Seq(
      Row(100L, (chunk ++ words(0)).mkString(" "), "en", "src1"),
      Row(101L, words(11).mkString(" "), "en", "src1"),
      Row(900L, (words(21) ++ poison).mkString(" "), "en", "src0")))
    val delta = docsDf(Seq(
      Row(1L, (chunk ++ words(14)).mkString(" "), "en", "src1")))
    val (batch, inc) = runBoth(corpus, delta, Bounds)
    assert(inc == batch, s"stale-verdict census diverged:\n inc   $inc\n batch $batch")
    // fired: corpus alone contaminates doc 100; the union does not
    val cAlone = censusMap(Pipeline.curationPipeline(corpus,
      "doc_id", "text", "lang", "source", bounds = Bounds))
    assert(cAlone(3)._1 - cAlone(4)._1 == 1L,
      "stored state should mark the corpus doc contaminated")
    assert(batch(3)._1 - batch(4)._1 == 0L,
      "rebuild should keep the doc once the poison chunk is rewritten away")
  }

  test("empty delta: incremental census == corpus batch census") {
    val corpus = docsDf(Seq(
      Row(100L, words(2, 40).mkString(" "), "en", "src1"),
      Row(101L, words(8).mkString(" "), "fr", "src1"),
      Row(900L, words(20).mkString(" "), "en", "src0")))
    val delta = docsDf(Seq.empty[Row])
    val (batch, inc) = runBoth(corpus, delta, Bounds)
    assert(inc == batch, s"empty-delta census diverged:\n inc   $inc\n batch $batch")
  }
}
