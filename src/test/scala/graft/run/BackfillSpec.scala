package graft.run

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.ext.{Pipeline, Similarity, TextOps}
import graft.io.TableIO

/**
 * Three-way equality for the backfill driver: COLD-START BACKFILL
 * (parquet batches replayed through foldBatch) ≡ STREAMING FOLD
 * (MemoryStream through the maintainer) ≡ BATCH REBUILD (the operator
 * over the union) — plus the watermark-resume property a catch-up
 * driver depends on (re-replaying a directory over a live ledger is a
 * no-op for applied batches and folds only the new ones).
 */
class BackfillSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3
  private val Bands = 3
  private val BandPlanes = 4

  private def fixture: DataFrame =
    TableIO.read(spark, Sf, "embeddings").select("vec_id", "embedding")

  private def knnBatches: Seq[DataFrame] = Seq(
    fixture.filter(col("vec_id") < 40),
    fixture.filter(col("vec_id") >= 40 && col("vec_id") < 55),
    fixture.filter(col("vec_id") >= 55 && col("vec_id") < 70))

  private def knnFold(stateDir: String)(df: DataFrame, id: Long): Boolean =
    StreamingKnn.foldBatch(df, id, stateDir, K, Bands, BandPlanes,
      symmetric = true, rebuildThresholdPpm = 1000001L)

  private def directedRows(stateDir: String): Seq[String] =
    StreamingKnn.directed(spark, stateDir)
      .orderBy("src", "dst").collect().map(_.toString).toSeq

  test("kNN: cold-start backfill == streaming fold == batch rebuild") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batches = knnBatches

    // way 1 — backfill: land the history as batch_<id> parquet, replay
    val batchesDir = tmpDir() + "/history"
    batches.zipWithIndex.foreach { case (b, i) =>
      Backfill.writeBatch(b, batchesDir, i.toLong)
    }
    val viaBackfill = tmpDir() + "/knn_bf"
    val arms = Backfill.replay(spark, batchesDir)(knnFold(viaBackfill))
    assert(arms.map(_._1) == Seq(0L, 1L, 2L), "batches replayed out of order")
    assert(arms.head._2 && arms.tail.forall(!_._2),
      "expected bootstrap rebuild then incremental folds")

    // way 2 — streaming: the same history through the live maintainer
    val viaStream = tmpDir() + "/knn_st"
    val source = MemoryStream[(Long, Seq[Float])]
    val stream = source.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val q = StreamingKnn.start(stream, viaStream, tmpDir(), K, Bands,
      BandPlanes, symmetric = true, rebuildThresholdPpm = 1000001L)
    try {
      batches.foreach { b =>
        source.addData(b.as[(Long, Seq[Float])].collect().toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // way 3 — batch rebuild over the union
    val rebuild = Similarity.knnDirectedBanded(
        batches.reduce(_ unionByName _), K, Bands, BandPlanes, symmetric = true)
      .orderBy("src", "dst").collect().map(_.toString).toSeq

    assert(directedRows(viaBackfill) == rebuild, "backfill diverged from the rebuild")
    assert(directedRows(viaStream) == rebuild, "streaming fold diverged from the rebuild")
  }

  test("kNN: re-replaying a directory resumes from the watermark (applied batches are no-ops)") {
    val batches = knnBatches
    val batchesDir = tmpDir() + "/history"
    val stateDir = tmpDir() + "/knn_bf"
    // land + replay only the first two batches
    batches.take(2).zipWithIndex.foreach { case (b, i) =>
      Backfill.writeBatch(b, batchesDir, i.toLong)
    }
    Backfill.replay(spark, batchesDir)(knnFold(stateDir)): Unit
    val afterTwo = directedRows(stateDir)
    // batch 3 lands later; the catch-up replay sees all three
    Backfill.writeBatch(batches(2), batchesDir, 2L)
    Backfill.replay(spark, batchesDir)(knnFold(stateDir)): Unit
    assert(directedRows(stateDir) ==
      Similarity.knnDirectedBanded(batches.reduce(_ unionByName _), K, Bands,
          BandPlanes, symmetric = true)
        .orderBy("src", "dst").collect().map(_.toString).toSeq,
      "catch-up replay diverged")
    assert(directedRows(stateDir) != afterTwo, "third batch was not folded")
    // a full second replay is a complete no-op
    val again = Backfill.replay(spark, batchesDir)(knnFold(stateDir))
    assert(again.forall(!_._2) && directedRows(stateDir) != afterTwo)
  }

  test("curation: backfilled ledger census == batch pipeline over the union") {
    val bounds = TextOps.GopherBounds(minWords = 10, maxWords = 200)
    def words(seed: Int, n: Int = 30): Seq[String] =
      Seq("the", "a") ++ (0 until n - 2).map(i => s"w${('a' + (seed + i) % 26).toChar}${"x" * (i % 4)}q$i")
    def doc(id: Long, seed: Int, src: String = "src1") =
      (id, words(seed, 40).mkString(" "), "en", src)
    val b1 = Seq(doc(100L, 0), doc(101L, 7), doc(900L, 21, "src0"))
    val b2 = Seq(doc(1L, 3), doc(102L, 13))
    val batchesDir = tmpDir() + "/history"
    Backfill.writeBatch(b1.toDF("doc_id", "text", "lang", "source"), batchesDir, 0L)
    Backfill.writeBatch(b2.toDF("doc_id", "text", "lang", "source"), batchesDir, 1L)
    val stateDir = tmpDir() + "/cur_bf"
    Backfill.replay(spark, batchesDir) { (df, id) =>
      StreamingCuration.foldBatch(df, id, stateDir, "doc_id", "text", "lang",
        "source", bounds = bounds, rebuildThresholdPpm = 1000001L)
    }: Unit
    val census = StreamingCuration.census(spark, stateDir, "doc_id", "lang")
      .collect().map(_.toString).toSeq
    val batch = Pipeline.curationPipeline(
        (b1 ++ b2).toDF("doc_id", "text", "lang", "source"),
        "doc_id", "text", "lang", "source", bounds = bounds)
      .collect().map(_.toString).toSeq
    assert(census == batch, "backfilled curation ledger diverged from the batch pipeline")
  }
}
