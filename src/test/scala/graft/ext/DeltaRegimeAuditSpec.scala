package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * The delta-regime audit (r14 verdict item 5): the measured
 * uniform-vs-localized boundary must be visible to the caller as a
 * touched-bucket fraction plus an advise_rebuild verdict — a DIFFUSE
 * delta (docs landing in many stored buckets) must flip the advice to
 * rebuild; a LOCALIZED batch of fresh content must not.
 */
class DeltaRegimeAuditSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.types._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType)))

  private def docsDf(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(rows.asJava, schema)

  private def words(seed: Int, n: Int = 30): Seq[String] =
    Seq("the", "a") ++ (0 until n - 2).map(i => s"word${('a' + (seed + i) % 26).toChar}${"x" * (i % 4)}q$i")

  private val Bounds = TextOps.GopherBounds(minWords = 10, maxWords = 200)

  private def audit(corpus: DataFrame, delta: DataFrame): Row = {
    val st = PipelineIncremental.curationState(corpus,
      "doc_id", "text", "lang", "source", bounds = Bounds)
    PipelineIncremental.deltaRegimeAudit(st, delta,
      "doc_id", "text", "lang", "source", bounds = Bounds).head()
  }

  private def corpus10: DataFrame = docsDf(
    (0 until 10).map(i => Row(100L + i, words(3 * i, 35).mkString(" "), "en", "src1")))

  test("diffuse delta (near-copies of half the corpus) advises rebuild") {
    // each delta doc shares its text with a corpus doc up to a fresh tail
    // token: same shingle mass -> same band buckets -> touched fraction
    // ~>= 1/2 of the stored bucket space
    val delta = docsDf((0 until 5).map(i =>
      Row(1L + i, words(3 * i, 35).updated(34, s"tail$i").mkString(" "), "en", "src1")))
    val r = audit(corpus10, delta)
    assert(r.getAs[Long]("n_delta_docs") == 5L)
    assert(r.getAs[Long]("touched_ppm") >= 250000L,
      s"diffuse delta should touch >= 25% of buckets, got ${r.getAs[Long]("touched_ppm")} ppm")
    assert(r.getAs[Boolean]("advise_rebuild"),
      "diffuse delta must advise the rebuild path")
  }

  test("localized fresh-content delta keeps the incremental advice") {
    val delta = docsDf(Seq(Row(1L, words(77, 35).mkString(" "), "en", "src1")))
    val r = audit(corpus10, delta)
    assert(r.getAs[Long]("n_delta_docs") == 1L)
    assert(r.getAs[Long]("n_t2_docs") == 0L,
      "fresh content must not flip any stored chunk's df")
    assert(r.getAs[Long]("touched_ppm") < 250000L,
      s"fresh batch touched ${r.getAs[Long]("touched_ppm")} ppm — should be far under the threshold")
    assert(!r.getAs[Boolean]("advise_rebuild"))
  }

  test("audit totals are consistent with the stored + changed bucket spaces") {
    val delta = docsDf(Seq(Row(1L, words(77, 35).mkString(" "), "en", "src1")))
    val st = PipelineIncremental.curationState(corpus10,
      "doc_id", "text", "lang", "source", bounds = Bounds)
    val r = PipelineIncremental.deltaRegimeAudit(st, delta,
      "doc_id", "text", "lang", "source", bounds = Bounds).head()
    // the union bucket space is bounded by stored + delta-side keys, and
    // touched keys are a subset of it
    val stored = st.melted.select("band", "bkey").distinct().count()
    assert(r.getAs[Long]("n_touched_buckets") <= r.getAs[Long]("n_total_buckets"))
    assert(r.getAs[Long]("n_total_buckets") >= stored,
      "union bucket space cannot shrink under an append-only fresh delta")
  }
}
