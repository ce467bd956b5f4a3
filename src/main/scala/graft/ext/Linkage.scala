package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * X29 — blocked fuzzy record linkage (entity resolution) over a string
 * column (SURVEY.md §2.11). The reference has no analog; this is the
 * "find each record's best fuzzy match" primitive of dedupe/linkage
 * pipelines (catalog reconciliation, name matching), built scale-first:
 *
 *  - candidate pairs come ONLY from an equi-join on a caller-chosen
 *    blocking key (brand, zip, sorted-token prefix, …) — the all-pairs
 *    O(n²) comparison never happens;
 *  - a per-block size cap (window count over the block key, the same
 *    partitioning the join needs — one exchange, reused) bounds the
 *    quadratic blowup of a degenerate block, exactly like the LSH
 *    bucket caps in Dedup.minhashPairsBanded;
 *  - |len(a) − len(b)| ≤ maxDist prefilters candidates before the O(len²)
 *    Levenshtein kernel runs (length difference lower-bounds edit
 *    distance), keeping the expensive comparison off most pairs;
 *  - output is the best match PER RECORD (min distance, then lowest
 *    match id — a total order), not the pair list: bounded at one row
 *    per record regardless of block density, the shape a downstream
 *    merge step actually consumes.
 *
 * Levenshtein is Spark's builtin codegen'd expression (unit-cost edit
 * distance) — cross-engine exact, integer result.
 */
object Linkage {

  /**
   * For every row, the nearest other row (by edit distance on `strCol`)
   * sharing its blocking key, at distance ≤ maxDist. Rows in blocks
   * larger than `blockCap` are dropped from candidate generation (and
   * reported nowhere) — a degenerate block (empty key, boilerplate
   * value) would otherwise emit O(block²) comparisons; the cap is the
   * documented recall/cost lever, like Dedup's LSH bucket caps.
   *
   * Output: (idCol, strCol, match_id, match_str, dist), one row per
   * record with ≥1 in-range candidate, dist ∈ [0, maxDist].
   */
  def nearestInBlock(df: DataFrame, idCol: String, strCol: String,
      blockCols: Seq[String], maxDist: Int, blockCap: Long = 10000L): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    require(blockCap >= 2, s"blockCap must allow at least a pair, got $blockCap")
    require(blockCols.nonEmpty, "need at least one blocking column")
    val cols = (Seq(idCol, strCol) ++ blockCols).distinct.map(col)
    val capped = df.select(cols: _*)
      .withColumn("__bsize", count(lit(1)).over(Window.partitionBy(blockCols.map(col): _*)))
      .filter(col("__bsize") <= blockCap)
      .drop("__bsize")

    val a = capped
    val b = blockCols.foldLeft(
        capped.withColumnRenamed(idCol, "match_id").withColumnRenamed(strCol, "match_str")) {
      (d, c) => d.withColumnRenamed(c, s"__b_$c")
    }
    val joinCond = blockCols.map(c => a(c) === b(s"__b_$c")).reduce(_ && _) &&
      a(idCol) =!= b("match_id") &&
      abs(length(a(strCol)) - length(b("match_str"))) <= maxDist
    val cand = a.join(b, joinCond)
      .withColumn("dist", levenshtein(col(strCol), col("match_str")))
      .filter(col("dist") <= maxDist)
    // best match per record: min distance, ties to the lowest match id —
    // a total order, so the survivor is partitioning-independent
    cand
      .withColumn("__rk", row_number().over(
        Window.partitionBy(idCol).orderBy(col("dist"), col("match_id"))))
      .filter(col("__rk") === 1)
      .select(col(idCol), col(strCol), col("match_id"), col("match_str"), col("dist"))
  }
}
