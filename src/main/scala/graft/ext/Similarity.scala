package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * X3/X5 — similarity search over embedding columns (`Array[Float]`,
 * modeling CQL `vector<float, n>` — SURVEY.md §1.3, §2.11).
 *
 * v1 ships brute-force cosine top-k (the exact baseline) plus a
 * label-blocked variant that models IVF coarse quantization: candidates
 * are restricted to the query's cell, turning the O(N·Q) scan into
 * O(N·Q / cells) — the standard ANN scale path (PAPERS.md block/LSH
 * literature). Top-k selection is two-phase: per-shuffle-partition
 * row_number first (bounds every partition's output at k·queries rows),
 * then a global rank over the tiny survivor set — the all-pairs stream
 * never converges on one reducer.
 *
 * Determinism: dot products fold left in array order with double
 * arithmetic in both Spark and the DuckDB oracle; ranking uses the
 * 6-decimal-rounded score with the neighbor id as total tiebreak
 * (SURVEY.md §7.5.5).
 */
object Similarity {

  /** Left-fold dot product with per-element double cast — bit-identical
   * to the oracle's list_reduce mirror. Backed by the codegen'd
   * FloatVectorDot kernel; [[dotHof]] keeps the declarative formulation
   * for cross-checking. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.FloatVectorDot.dot(a, b)

  /** Reference higher-order-function formulation of [[dot]] (same fold
   * order, same bits; ~8× slower per pair — kept for equivalence tests). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Brute-force exact top-k: every query vector against every candidate.
   * `queries` must be small (it is broadcast); candidates stream at full
   * scan parallelism. Output: query_id, rank (1..k), neighbor_id, cos6.
   */
  def topK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    // Norms are per-row, so compute them once on each side of the join —
    // per pair only the single cross dot product remains.
    val q = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_norm"))
    val c = candidates.withColumn("c_norm", norm(col("embedding")))
    val pairs = c
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos6", round(dot(col("q_emb"), col("embedding")) / (col("q_norm") * col("c_norm")), 6))
    rankTopK(pairs, k)
  }

  /** IVF-style blocked top-k: candidates restricted to the query's coarse
   * cell (here the `label` column stands in for the centroid id). */
  def topKBlocked(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      col("label").as("q_label"), norm(col("embedding")).as("q_norm"))
    val c = candidates.withColumn("c_norm", norm(col("embedding")))
    val pairs = c
      .join(broadcast(q), col("label") === col("q_label") && col("vec_id") =!= col("query_id"))
      .drop("q_label")
      .withColumn("cos6", round(dot(col("q_emb"), col("embedding")) / (col("q_norm") * col("c_norm")), 6))
    rankTopK(pairs, k)
  }

  /** Two-phase top-k: local rank inside each shuffle partition bounds the
   * data before the global rank — no single hot reducer at scale. */
  private def rankTopK(pairs: DataFrame, k: Int): DataFrame = {
    val local = pairs
      .withColumn("__part", spark_partition_id())
      .withColumn("__lr", row_number().over(
        Window.partitionBy("query_id", "__part").orderBy(col("cos6").desc, col("vec_id"))))
      .filter(col("__lr") <= k)
    local
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos6").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cos6"))
  }

  /** X2d — embedding-cosine near-duplicate pairs within a blocking cell:
   * the LSH/IVF-blocked formulation of semantic dedup. */
  def nearDupPairs(df: DataFrame, threshold: Double): DataFrame = {
    val a = df.select(col("label"), col("vec_id").as("id_a"), col("embedding").as("emb_a"),
      norm(col("embedding")).as("norm_a"))
    val b = df.select(col("label"), col("vec_id").as("id_b"), col("embedding").as("emb_b"),
      norm(col("embedding")).as("norm_b"))
    a.join(b, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos6", round(dot(col("emb_a"), col("emb_b")) / (col("norm_a") * col("norm_b")), 6))
      .filter(col("cos6") > threshold)
      .select("label", "id_a", "id_b", "cos6")
  }
}
