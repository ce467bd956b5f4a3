package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Randomized incremental-equals-rebuild property for the X42b pipeline:
 * seeded random corpora/deltas engineered for COLLISION DENSITY (tiny
 * vocabulary, whole- and partial-document copies, rare eval docs) under
 * aggressive parameters (bucketCap 3, chunkSize 4, minJaccard 0.3), so
 * chunk-df flips, cross-batch drops, cap flips and eval growth occur in
 * random combinations the hand-built adversarial cases can't enumerate.
 * Every trial asserts the incremental census is bit-equal to the batch
 * rebuild over the union. Seeds are fixed — failures reproduce.
 */
class PipelineIncrementalPropertySpec extends SparkSpec {

  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.types._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType)))

  // tiny vocab with the two default stopwords over-represented so most
  // docs pass the (permissive) Gopher gate while some still fail
  private val vocab: Vector[String] =
    Vector("the", "a", "the", "a") ++
      (0 until 26).map(i => s"wrd${('a' + i).toChar}q").toVector

  private def mkDocs(rng: scala.util.Random, ids: Seq[Long]): Seq[(Long, String, String, String)] = {
    val texts = scala.collection.mutable.ArrayBuffer.empty[String]
    ids.map { id =>
      val text = rng.nextInt(10) match {
        case 0 if texts.nonEmpty => // whole-document copy (cap-flip fuel)
          texts(rng.nextInt(texts.length))
        case 1 if texts.nonEmpty => // near-copy: mutate one word (cross-batch drops)
          val w = texts(rng.nextInt(texts.length)).split(" ")
          w.updated(rng.nextInt(w.length), vocab(rng.nextInt(vocab.length))).mkString(" ")
        case 2 => // very short doc (no shingles, below minWords)
          Seq.fill(1 + rng.nextInt(3))(vocab(rng.nextInt(vocab.length))).mkString(" ")
        case _ => // fresh doc, 12..40 words from the tiny vocab
          Seq.fill(12 + rng.nextInt(29))(vocab(rng.nextInt(vocab.length))).mkString(" ")
      }
      texts += text
      val lang = if (rng.nextBoolean()) "en" else "fr"
      val src = if (rng.nextInt(8) == 0) "src0" else s"src${1 + rng.nextInt(2)}"
      (id, text, lang, src)
    }
  }

  private def df(rows: Seq[(Long, String, String, String)]): DataFrame =
    spark.createDataFrame(
      rows.map { case (i, t, l, s) => Row(i, t, l, s) }.asJava, schema)

  test("random corpora: incremental census == batch rebuild census (10 seeds)") {
    val bounds = TextOps.GopherBounds(minWords = 8, maxWords = 200, minStopwords = 1)
    for (seed <- 1 to 10) {
      val rng = new scala.util.Random(seed)
      val corpus = df(mkDocs(rng, (100L until (100L + 20 + rng.nextInt(15))).toSeq))
      val delta = df(mkDocs(rng, (1L until (1L + 5 + rng.nextInt(10))).toSeq))
      val batch = Pipeline.curationPipeline(corpus.union(delta),
          "doc_id", "text", "lang", "source", bounds = bounds,
          chunkSize = 4, minJaccard = 0.3, bucketCap = 3)
        .collect().toSeq
      val st = PipelineIncremental.curationState(corpus,
        "doc_id", "text", "lang", "source", bounds = bounds,
        chunkSize = 4, minJaccard = 0.3, bucketCap = 3)
      val inc = PipelineIncremental.curationPipelineIncremental(st, delta,
          "doc_id", "text", "lang", "source", bounds = bounds,
          chunkSize = 4, minJaccard = 0.3, bucketCap = 3)
        .collect().toSeq
      assert(inc == batch, s"seed=$seed census diverged:\n inc   $inc\n batch $batch")
    }
  }
}
