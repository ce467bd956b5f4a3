package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.TableIO

/**
 * X44 pins: the distributed batch-perceptron trajectory equals an
 * independent in-memory reference epoch by epoch, the feature stream
 * equals a declarative recount, the margin-0 boundary side is the
 * documented one, and training separates a separable toy.
 */
class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: the textbook full-batch rule over local
   * arrays (no Spark), same margin-0-is-misclassified convention. */
  private def ref(feats: Seq[(Long, Int, Long, Long)], dims: Int, epochs: Int): Array[Long] = {
    val w = Array.fill(dims)(0L)
    (1 to epochs).foreach { _ =>
      val mis = feats.groupBy(f => (f._1, f._2)).collect {
        case ((id, y), fs) if y * fs.map(f => w(f._3.toInt) * f._4).sum <= 0 => id
      }.toSet
      val g = Array.fill(dims)(0L)
      feats.filter(f => mis(f._1)).foreach(f => g(f._3.toInt) += f._2.toLong * f._4)
      (0 until dims).foreach(d => w(d) += g(d))
    }
    w
  }

  test("train equals the in-memory reference on a constructed corpus, 1..4 epochs") {
    // doc 1/2 positive, 3/4 negative; overlapping dims so several epochs
    // keep updating (not separable in one step)
    val feats = Seq(
      (1L, 1, 0L, 2L), (1L, 1, 1L, 1L),
      (2L, 1, 1L, 3L), (2L, 1, 2L, 1L),
      (3L, -1, 1L, 2L), (3L, -1, 3L, 2L),
      (4L, -1, 0L, 1L), (4L, -1, 2L, 4L))
    val df = feats.toDF("doc_id", "y", "dim", "tf")
    (1 to 4).foreach { e =>
      val got = Perceptron.train(df, "doc_id", dims = 4, epochs = e)
        .orderBy("dim").collect().map(r => r.getLong(1))
      assert(got.toSeq == ref(feats, 4, e).toSeq, s"epoch-$e weights diverged")
    }
  }

  test("featureStream equals a declarative recount over the fixture") {
    val docs = TableIO.read(spark, Sf, "documents").filter(col("doc_id") < 200)
    val y = when(col("source") === "src0", lit(1)).otherwise(lit(-1))
    val got = Perceptron.featureStream(docs, "doc_id", "text", y, dims = 64)
    val want = docs
      .select(col("doc_id"), y.as("y"), explode(TextOps.tokens(col("text"))).as("t"))
      .select(col("doc_id"), col("y"), pmod(TextOps.tokenHash(col("t")), lit(64L)).as("dim"))
      .groupBy("doc_id", "y", "dim").agg(count(lit(1)).as("tf"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("zero weights score margin 0 and predict -1") {
    val docs = TableIO.read(spark, Sf, "documents").filter(col("doc_id") < 20)
    val w0 = spark.range(64).select(col("id").as("dim"), lit(0L).as("w"))
    val out = Perceptron.classify(docs, "doc_id", "text", w0, dims = 64)
    assert(out.count() > 0)
    assert(out.filter(col("margin") =!= 0L || col("pred") =!= -1).isEmpty)
  }

  test("training separates a class-disjoint toy (and the margins say so)") {
    // class-disjoint dims -> one epoch separates; assert via classify on
    // the training docs through the real scoring path
    val feats = Seq(
      (1L, 1, 0L, 3L), (2L, 1, 1L, 2L),
      (3L, -1, 2L, 4L), (4L, -1, 3L, 1L)).toDF("doc_id", "y", "dim", "tf")
    val w = Perceptron.train(feats, "doc_id", dims = 4, epochs = 2)
    val margins = feats.join(broadcast(w), "dim")
      .groupBy("doc_id", "y").agg(sum(col("tf") * col("w")).as("margin"))
    assert(margins.filter(col("y") * col("margin") <= 0).isEmpty,
      "separable toy not separated after 2 epochs")
  }
}
