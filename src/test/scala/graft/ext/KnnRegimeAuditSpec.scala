package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.TableIO

/**
 * X36e(f) pins: the kNN delta-regime audit separates the two measured
 * regimes — a LOCALIZED batch (copies of one base vector, landing in its
 * buckets) yields a small touched set and a low affected fraction, a
 * DIFFUSE batch (spread across the corpus) advises rebuild — and the
 * affected count agrees with an independent recount of the forward
 * affected-set definition.
 */
class KnnRegimeAuditSpec extends SparkSpec {

  private val Bands = 2
  private val BandPlanes = 8 // 256 buckets/band so a localized delta stays local

  private def emb = TableIO.read(spark, Sf, "embeddings")
    .select("vec_id", "embedding")

  test("localized delta: few touched keys, low affected fraction, no rebuild advice") {
    val base = emb.filter(col("vec_id") < 900)
    // 10 exact copies of base vector 0 — every band's true bucket is v0's
    val delta = base.filter(col("vec_id") === 0)
      .crossJoin(spark.range(10).select((col("id") + 10000L).as("new_id")))
      .select(col("new_id").as("vec_id"), col("embedding"))
    val row = Similarity.knnDeltaRegimeAudit(base, delta, Bands, BandPlanes,
      probes = 2).head()
    assert(row.getAs[Long]("n_delta") == 10L)
    assert(row.getAs[Long]("n_touched") <= Bands,
      s"copies of one vector must touch at most one bucket per band, got ${row.getAs[Long]("n_touched")}")
    assert(row.getAs[Long]("affected_ppm") < 100000L,
      s"localized delta read as diffuse: ${row.getAs[Long]("affected_ppm")} ppm")
    assert(!row.getAs[Boolean]("advise_rebuild"))
  }

  test("diffuse delta: touched set covers the index, advises rebuild") {
    val base = emb.filter(col("vec_id") % 5 =!= 4)
    val delta = emb.filter(col("vec_id") % 5 === 4) // uniform 20% slice
    val row = Similarity.knnDeltaRegimeAudit(base, delta, Bands, BandPlanes,
      probes = 2).head()
    assert(row.getAs[Long]("n_touched") > Bands * 10,
      "a uniform fixture slice must touch many buckets per band")
    assert(row.getAs[Boolean]("advise_rebuild"),
      s"uniform 20% delta must advise rebuild, got ${row.getAs[Long]("affected_ppm")} ppm")
  }

  test("n_aff equals an independent recount of the forward affected set") {
    val base = emb.filter(col("vec_id") < 600)
    val delta = emb.filter(col("vec_id") >= 600 && col("vec_id") < 650)
    val row = Similarity.knnDeltaRegimeAudit(base, delta, Bands, BandPlanes,
      probes = 2).head()
    // recount: base vectors with ≥1 probed (band, bucket) in the delta's
    // true-key set — the affectedFwd definition, reformulated
    def keys(df: org.apache.spark.sql.DataFrame, probed: Boolean) = df.select(
        col("vec_id"), posexplode(org.apache.spark.sql.graft.FloatVectorDot
          .lshBandProbes(col("embedding"), Bands, BandPlanes, 2)).as(Seq("band", "pb")))
      .select(col("vec_id"), col("band"),
        (if (probed) explode(col("pb")) else element_at(col("pb"), 1)).as("bucket"))
    val want = keys(base, probed = true)
      .join(keys(delta, probed = false).select("band", "bucket").distinct(), Seq("band", "bucket"))
      .select("vec_id").distinct().count()
    assert(row.getAs[Long]("n_aff") == want)
  }
}
