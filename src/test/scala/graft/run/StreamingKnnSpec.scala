package graft.run

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.ext.Similarity
import graft.io.TableIO

/**
 * MemoryStream parity + restart-safety for the streaming banded-kNN
 * maintainer: after every micro-batch the persisted directed state must
 * equal knnDirectedBanded over everything ingested so far (the
 * incremental fold's rebuild-equal contract, now through the ledger-swap
 * transaction), and a replayed batch must fold exactly once. Runs the
 * SYMMETRIZED discovery face so the reverse-probe affected set crosses
 * the persistence boundary too.
 */
class StreamingKnnSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3
  private val Bands = 3
  private val BandPlanes = 4

  private def fixture: DataFrame =
    TableIO.read(spark, Sf, "embeddings").select("vec_id", "embedding")

  private def rebuild(batches: Seq[DataFrame]): Seq[String] =
    Similarity.knnDirectedBanded(batches.reduce(_ unionByName _), K, Bands,
        BandPlanes, symmetric = true)
      .orderBy("src", "dst").collect().map(_.toString).toSeq

  private def persisted(stateDir: String): Seq[String] =
    StreamingKnn.directed(spark, stateDir)
      .orderBy("src", "dst").collect().map(_.toString).toSeq

  private def asRows(df: DataFrame): Seq[(Long, Seq[Float])] =
    df.as[(Long, Seq[Float])].collect().toSeq

  test("maintainer parity: persisted directed state == banded rebuild after every micro-batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stateDir = tmpDir() + "/knn"
    val source = MemoryStream[(Long, Seq[Float])]
    val stream = source.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val b1 = fixture.filter(col("vec_id") < 40)
    val b2 = fixture.filter(col("vec_id") >= 40 && col("vec_id") < 55)
    val b3 = fixture.filter(col("vec_id") >= 55 && col("vec_id") < 70)
    // threshold above any possible ppm pins the INCREMENTAL arm — at
    // fixture scale almost every base query probes a delta-touched
    // bucket, so the default audit gate would route every batch to the
    // rebuild arm and this parity test would stop exercising the fold
    val q = StreamingKnn.start(stream, stateDir, tmpDir(), K, Bands,
      BandPlanes, symmetric = true, rebuildThresholdPpm = 1000001L)
    try {
      source.addData(asRows(b1): _*); q.processAllAvailable()
      assert(persisted(stateDir) == rebuild(Seq(b1)), "bootstrap state diverged")
      source.addData(asRows(b2): _*); q.processAllAvailable()
      assert(persisted(stateDir) == rebuild(Seq(b1, b2)),
        "2-batch fold diverged from the banded rebuild")
      source.addData(asRows(b3): _*); q.processAllAvailable()
      assert(persisted(stateDir) == rebuild(Seq(b1, b2, b3)),
        "3-batch fold diverged from the banded rebuild")
      // the mutual view a communities job reads between batches
      val mutual = StreamingKnn.mutualGraph(spark, stateDir)
        .orderBy("id_a", "id_b").collect().map(_.toString).toSeq
      val mutualRebuild = Similarity.knnGraphBanded(
          Seq(b1, b2, b3).reduce(_ unionByName _), K, Bands, BandPlanes,
          symmetric = true)
        .orderBy("id_a", "id_b").collect().map(_.toString).toSeq
      assert(mutual == mutualRebuild, "mutual view diverged")
    } finally q.stop()
  }

  test("restart from checkpoint: replayed batch folds exactly once") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stateDir = tmpDir() + "/knn"
    val ckpt = tmpDir()
    val source = MemoryStream[(Long, Seq[Float])]
    val stream = source.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val b1 = fixture.filter(col("vec_id") < 40)
    val b2 = fixture.filter(col("vec_id") >= 40 && col("vec_id") < 55)
    val b3 = fixture.filter(col("vec_id") >= 55 && col("vec_id") < 70)

    val q1 = StreamingKnn.start(stream, stateDir, ckpt, K, Bands,
      BandPlanes, symmetric = true, rebuildThresholdPpm = 1000001L)
    try {
      source.addData(asRows(b1): _*); q1.processAllAvailable()
      source.addData(asRows(b2): _*); q1.processAllAvailable()
    } finally q1.stop()

    // crash shape: batch 2's ledger swap completed but its checkpoint
    // commit never landed — the restart must replay it as a no-op (a
    // re-fold would double-insert b2's vectors)
    val commits = new java.io.File(s"$ckpt/commits")
    val last = commits.listFiles().map(_.getName).filter(_.forall(_.isDigit)).map(_.toInt).max
    assert(new java.io.File(commits, last.toString).delete(), "could not simulate crash")
    new java.io.File(commits, s".$last.crc").delete()

    source.addData(asRows(b3): _*) // arrives while the maintainer is down
    val q2 = StreamingKnn.start(stream, stateDir, ckpt, K, Bands,
      BandPlanes, symmetric = true, rebuildThresholdPpm = 1000001L)
    try {
      q2.processAllAvailable()
      assert(persisted(stateDir) == rebuild(Seq(b1, b2, b3)),
        "restart broke exactly-once kNN state")
    } finally q2.stop()
  }

  test("regime gate: a diffuse batch takes the rebuild arm, state equal to the incremental arm's") {
    val b1 = fixture.filter(col("vec_id") < 40)
    // a uniform slice of the id space touches most of the small banded
    // bucket space — the engineered diffuse batch the audit must catch
    val diffuse = fixture.filter(col("vec_id") >= 40 && col("vec_id") < 80)
    val viaGate = tmpDir() + "/knn_gate"
    val viaIncr = tmpDir() + "/knn_incr"

    assert(StreamingKnn.foldBatch(b1, 0L, viaGate, K, Bands, BandPlanes,
      symmetric = true), "bootstrap must report the rebuild arm")
    assert(StreamingKnn.foldBatch(diffuse, 1L, viaGate, K, Bands, BandPlanes,
      symmetric = true), "diffuse batch must take the audit-advised rebuild arm")

    assert(StreamingKnn.foldBatch(b1, 0L, viaIncr, K, Bands, BandPlanes,
      symmetric = true, rebuildThresholdPpm = 1000001L))
    assert(!StreamingKnn.foldBatch(diffuse, 1L, viaIncr, K, Bands, BandPlanes,
      symmetric = true, rebuildThresholdPpm = 1000001L),
      "with the gate disabled the fold must stay incremental")

    assert(persisted(viaGate) == persisted(viaIncr),
      "rebuild arm diverged from the incremental arm")
    val corpus = (d: String) => spark.read.parquet(s"$d/corpus.parquet")
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(corpus(viaGate) == corpus(viaIncr), "corpus frames diverged across arms")
  }
}
