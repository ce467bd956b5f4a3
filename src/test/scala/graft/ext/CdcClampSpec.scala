package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Min/max-normalized content-defined chunking pins. The clamped boundary
 * rule depends on the previous cut (sequential scan), so like the BPE
 * trainer it is verified against an INDEPENDENT sequential reference
 * instead of the DuckDB oracle: the reference below recomputes the window
 * polynomial from scratch per position (no rolling update, no shared
 * kernel code path) — agreement over fixture + adversarial corpora is the
 * correctness argument. The unclamped parameterization must stay
 * bit-identical to the oracle-matched cdcChunks.
 */
class CdcClampSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: code points, per-position from-scratch window
   * polynomial, clamp rules applied in a plain sequential walk. */
  private def refSpans(text: String, window: Int, divisor: Long, p: Long,
      minLen: Int, maxLen: Int): Seq[(Int, Int, Long)] = {
    val cps = text.codePoints().toArray
    val n = cps.length
    val cuts = scala.collection.mutable.ArrayBuffer(0)
    if (n >= window) {
      var pos = window
      var lastCut = 0
      while (pos < n) {
        // window polynomial of cps(pos-window .. pos-1) from scratch
        var poly = 0L
        for (k <- pos - window until pos) poly = poly * 131L + cps(k)
        val len = pos - lastCut
        if ((maxLen > 0 && len == maxLen) || (len >= minLen && poly % divisor == 0L)) {
          cuts += pos
          lastCut = pos
        }
        pos += 1
      }
    }
    cuts += n
    cuts.toSeq.sliding(2).collect { case Seq(s, e) =>
      var h = 0L
      for (k <- s until e) h = (h * 131L + cps(k)) % p
      (s, e - s, h)
    }.toSeq
  }

  private val P = graft.ext.Dedup.P
  // divisor-aligned periodic pattern: 27·'a' + 9·'a' + 3·'a' + 'y' ≡ 0
  // (mod 64) — every 4th position is a content boundary, the adversarial
  // shape the clamp exists for
  private val periodic = "aaay" * 256
  // divisor-avoiding: the all-'a' window polynomial is ≡ 40 (mod 64) —
  // no content boundary ever fires, the one-giant-chunk shape
  private val flat = "a" * 1000

  test("clamped kernel equals the independent sequential reference") {
    val adversarial = Seq(
      (1L, periodic), (2L, flat), (3L, ""), (4L, "ab"), (5L, "aaay"),
      (6L, "中文" * 100 + "aaay" * 40), (7L, ("xy" + "aaay" * 10) * 20))
    val fixture = graft.io.TableIO.read(spark, Sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val docs = (adversarial ++ fixture.map { case (id, t) => (id + 1000L, t) })
      .toDF("doc_id", "text")
    val kernel = TextOps.cdcChunksClamped(docs, "doc_id", "text")
      .select($"doc_id", $"c_start", $"c_len", $"c_hash")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._2.toInt, r._3.toInt, r._4)).toSeq).toMap
    val texts = (adversarial ++ fixture.map { case (id, t) => (id + 1000L, t) }).toMap
    for ((id, t) <- texts) {
      val ref = refSpans(t, TextOps.CdcWindow, TextOps.CdcDivisor, P,
        TextOps.CdcMinLen, TextOps.CdcMaxLen)
      assert(kernel(id) === ref, s"doc $id diverged")
    }
  }

  test("minLen=1, maxLen=0 reproduces the unclamped oracle-matched form bit-for-bit") {
    val docs = graft.io.TableIO.read(spark, Sf, "documents")
    val clampedOff = TextOps.cdcChunksClamped(docs, "doc_id", "text", minLen = 1, maxLen = 0)
      .orderBy("doc_id", "chunk_idx").collect().toSeq
    val unclamped = TextOps.cdcChunks(docs, "doc_id", "text")
      .orderBy("doc_id", "chunk_idx").collect().toSeq
    assert(clampedOff === unclamped && unclamped.nonEmpty)
  }

  test("adversarial periodic text: chunk-count blowup is bounded, interior lengths clamped") {
    val docs = Seq((1L, periodic), (2L, flat)).toDF("doc_id", "text")
    val clamped = TextOps.cdcChunksClamped(docs, "doc_id", "text")
      .select($"doc_id", $"c_len").as[(Long, Long)].collect().groupBy(_._1)
    val unclamped = TextOps.cdcChunks(docs, "doc_id", "text")
      .select($"doc_id", $"c_len").as[(Long, Long)].collect().groupBy(_._1)
    // periodic: unclamped degenerates to ~len/4 chunks; clamp bounds the
    // table at <= ceil(len/minLen)+1 — here exactly len/32 (every 32nd
    // position is a divisor hit)
    assert(unclamped(1L).size >= periodic.length / 4 - 2,
      s"expected degenerate unclamped chunking, got ${unclamped(1L).size}")
    assert(clamped(1L).size <= periodic.length / TextOps.CdcMinLen + 1,
      s"clamp failed to bound the blowup: ${clamped(1L).size} chunks")
    // flat: unclamped yields ONE giant chunk; maxLen forces cuts
    assert(unclamped(2L).size === 1)
    assert(clamped(2L).size === (flat.length + TextOps.CdcMaxLen - 1) / TextOps.CdcMaxLen)
    // interior chunks within [minLen, maxLen]; final may run short but
    // never long
    for ((id, rows) <- clamped) {
      val lens = rows.map(_._2)
      assert(lens.forall(_ <= TextOps.CdcMaxLen), s"doc $id: chunk over maxLen")
      assert(lens.dropRight(1).forall(_ >= TextOps.CdcMinLen), s"doc $id: interior under minLen")
    }
  }

  test("clamped chunks tile the document and feed the repeat rollup") {
    val docs = graft.io.TableIO.read(spark, Sf, "documents")
    val ch = TextOps.cdcChunksClamped(docs, "doc_id", "text")
    // tiling: per doc, spans are contiguous from 0 and sum to the length
    val bad = ch.groupBy("doc_id")
      .agg(min("c_start").as("s0"), sum("c_len").as("total"),
        max(col("c_start") + col("c_len")).as("end"))
      .join(docs.select(col("doc_id"), length(col("text")).cast("long").as("len")), "doc_id")
      .filter(col("s0") =!= 0 || col("total") =!= col("len") || col("end") =!= col("len"))
    assert(bad.count() === 0)
    // the dedup application (chunk_cdc_repeats' shape) works on clamped
    // chunks: the fixture corpus carries repeated boilerplate
    val repeats = ch.filter(col("c_len") > 0)
      .groupBy("c_hash").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
    assert(repeats.count() > 0)
  }
}
