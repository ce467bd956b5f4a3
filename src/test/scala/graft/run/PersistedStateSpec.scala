package graft.run

import graft.SparkSpec
import graft.ext.{PipelineIncremental, Similarity, TextOps}
import graft.io.TableIO
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The persisted-ledger contract behind the registered incremental
 * queries (r14 verdict item 1):
 *
 *  1. reload→incremental ≡ in-memory-state→incremental — writing the
 *     ledger to parquet via [[StateStore]] and reloading it must not
 *     change a single output row of the delta pass, for BOTH the
 *     curation pipeline and the banded kNN graph;
 *  2. the [[PipelineIncremental.curationStateIncremental]] FOLD is
 *     frame-level rebuild-equal: every ledger frame of
 *     `fold(state(corpus), delta)` matches `state(corpus ∪ delta)`'s —
 *     the invariant the streaming maintainer leans on batch after batch.
 */
class PersistedStateSpec extends SparkSpec {

  private val Bounds = TextOps.GopherBounds(minWords = 20, maxWords = 80)

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("curation ledger: parquet reload -> incremental == in-memory state -> incremental") {
    val docs = TableIO.read(spark, Sf, "documents").filter(col("doc_id") < 400)
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    val delta = docs.filter(col("doc_id") % 5 === 4)
    val st = PipelineIncremental.curationState(corpus,
      "doc_id", "text", "lang", "source", bounds = Bounds)
    val inMem = PipelineIncremental.curationPipelineIncremental(st, delta,
      "doc_id", "text", "lang", "source", bounds = Bounds)
    val load = StateStore.materialize(spark, "spec_curation",
      PipelineIncremental.toFrames(st))
    val reloaded = PipelineIncremental.curationPipelineIncremental(
      PipelineIncremental.fromFrames(load), delta,
      "doc_id", "text", "lang", "source", bounds = Bounds)
    assert(sortedRows(reloaded) == sortedRows(inMem),
      "census over the reloaded parquet ledger diverged from the in-memory ledger")
    // the loader really is parquet-backed (scan-backed lineage, not the
    // build lineage): its plan must contain a FileScan over the store
    val plan = load("kept2").queryExecution.executedPlan.toString
    assert(plan.contains("parquet"), s"reloaded frame is not a parquet scan:\n$plan")
  }

  test("curation fold is frame-level rebuild-equal (the streaming invariant)") {
    val docs = TableIO.read(spark, Sf, "documents").filter(col("doc_id") < 400)
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    val delta = docs.filter(col("doc_id") % 5 === 4)
    val folded = PipelineIncremental.curationStateIncremental(
      PipelineIncremental.curationState(corpus,
        "doc_id", "text", "lang", "source", bounds = Bounds),
      delta, "doc_id", "text", "lang", "source", bounds = Bounds)
    val rebuilt = PipelineIncremental.curationState(corpus.union(delta),
      "doc_id", "text", "lang", "source", bounds = Bounds)
    val (ff, rf) = (PipelineIncremental.toFrames(folded), PipelineIncremental.toFrames(rebuilt))
    PipelineIncremental.FrameNames.foreach { name =>
      // column ORDER matters too (parquet schema stability across folds)
      assert(ff(name).columns.toSeq == rf(name).columns.toSeq,
        s"frame $name: fold schema ${ff(name).columns.toSeq} != rebuild ${rf(name).columns.toSeq}")
      assert(sortedRows(ff(name)) == sortedRows(rf(name)),
        s"frame $name diverged between fold and rebuild")
    }
  }

  test("banded kNN state: parquet reload -> incremental == in-memory state -> incremental") {
    val emb = TableIO.read(spark, Sf, "embeddings").filter(col("vec_id") < 400)
    val base = emb.filter(col("vec_id") % 5 =!= 4)
    val delta = emb.filter(col("vec_id") % 5 === 4)
    val st = Similarity.bandSurvivors(base, k = 4, bands = 6, bandPlanes = 4,
      probes = 2)
    val inMem = Similarity.knnGraphBandedIncremental(
      base, delta, st, k = 4, bands = 6, bandPlanes = 4, probes = 2, symmetric = true)
    val load = StateStore.materialize(spark, "spec_knnbanded", Map("survivors" -> st))
    val reloaded = Similarity.knnGraphBandedIncremental(
      base, delta, load("survivors"), k = 4, bands = 6, bandPlanes = 4,
      probes = 2, symmetric = true)
    assert(sortedRows(reloaded) == sortedRows(inMem),
      "banded incremental over the reloaded state diverged from the in-memory state")
  }

  test("materialize builds once per key and returns the persisted frames") {
    var builds = 0
    def frames: Map[String, DataFrame] = {
      builds += 1
      Map("t" -> spark.range(0, 5).toDF("id"))
    }
    val l1 = StateStore.materialize(spark, "spec_once", frames)
    val l2 = StateStore.materialize(spark, "spec_once", frames)
    assert(builds == 1, s"build ran $builds times for one key")
    assert(l1("t").count() == 5 && l2("t").count() == 5)
  }
}
