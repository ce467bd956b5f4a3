package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * X1/X2 — deduplication for training-data pipelines (SURVEY.md §2.11):
 * exact key dedup, MinHash-LSH near-dup, SimHash, and n-gram Jaccard.
 *
 * Scale design (100 TB posture):
 *  - exact dedup is one hash-shuffle on the key with map-side combine;
 *  - minhash/simhash signatures are per-row expressions (no shuffle);
 *  - LSH candidate pairs shuffle only on (band/signature) buckets, never
 *    all-pairs — the crossJoin never happens;
 *  - the deterministic row_number tiebreak (not dropDuplicates) makes
 *    reruns and oracle comparison stable (SURVEY.md §2.11 X1).
 */
object Dedup {

  /** Modulus for all signature hashing (prime, < 2^20 so products with
   * mix constants stay far inside int64). */
  val P = 1048573L

  /** X1 — exact dedup, deterministic variant: keep the lowest-id row per
   * key. A window with row_number (not dropDuplicates, whose survivor is
   * partitioning-dependent). */
  def exactKeep(df: DataFrame, keyCols: Seq[String], tiebreak: String): DataFrame =
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(keyCols.map(col): _*).orderBy(col(tiebreak))))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** X1 — cluster summary: representative id + duplicate count per key
   * (groupBy with map-side combine — one shuffle of pre-aggregated pairs). */
  def representatives(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** 3-gram shingle hashes of a whitespace-tokenized text column, as the
   * SQL-text expression both Spark and the DuckDB oracle evaluate:
   * shingle_i = (h(t_i)*10007 + h(t_{i+1})*131 + h(t_{i+2})) mod P for
   * i in 1..n-2 (1-based). */
  def shingleHashesSql(textCol: String): String = {
    def h(t: String) = TextOps.tokenHashSql(t)
    val tok = s"split($textCol, ' ')"
    s"""transform(sequence(1, size($tok) - 2),
       |  i -> CAST((${h(s"element_at($tok, i)")} * 10007
       |           + ${h(s"element_at($tok, i + 1)")} * 131
       |           + ${h(s"element_at($tok, i + 2)")}) % $P AS BIGINT))""".stripMargin
  }

  def shingleHashes(textCol: String): Column = expr(shingleHashesSql(textCol))

  /** X2 — one minhash signature component: min over shingles of the
   * universal hash (a*s + b) mod P. k components (distinct a,b) form the
   * signature; docs sharing the full signature are LSH candidates. */
  def minhash(shingles: Column, a: Long, b: Long): Column =
    array_min(transform(shingles, s => (s * lit(a) + lit(b)) % lit(P)))

  /** Default 4-component signature (calibrated on the fixtures: ~26
   * candidate pairs per 500 docs). */
  val MinhashSeeds: Seq[(Long, Long)] = Seq((7L, 13L), (31L, 101L), (131L, 17L), (1009L, 3L))

  def withMinhashSignature(df: DataFrame, textCol: String): DataFrame = {
    val sh = shingleHashes(textCol)
    MinhashSeeds.zipWithIndex.foldLeft(df) { case (d, ((a, b), i)) =>
      d.withColumn(s"sig$i", minhash(sh, a, b))
    }
  }

  /** X2 — LSH candidate pairs: docs agreeing on the whole signature.
   * The self-join shuffles on the signature (band bucket), so candidate
   * generation is O(bucket²) per bucket, never all-pairs. */
  def minhashPairs(sigs: DataFrame, idCol: String): DataFrame = {
    val sigCols = MinhashSeeds.indices.map(i => s"sig$i")
    val left = sigs.select((idCol +: sigCols).map(col): _*)
    val right = left.withColumnRenamed(idCol, s"${idCol}_b")
    left.join(right, sigCols, "inner")
      .filter(col(idCol) < col(s"${idCol}_b"))
      .select(col(idCol), col(s"${idCol}_b"))
  }

  /** X2b — 16-bit SimHash over mixed shingle hashes: bit b is set when
   * the sum of ±1 votes from each shingle's b-th bit is positive. One
   * nested higher-order expression, no shuffle. */
  def simhash16(textCol: String): Column =
    expr(
      s"""aggregate(
         |  transform(sequence(0, 15), b ->
         |    IF(aggregate(
         |         transform(${shingleHashesSql(textCol)}, s -> shiftright(CAST((s * 2654435761) % 65536 AS BIGINT), b) % 2 * 2 - 1),
         |         CAST(0 AS BIGINT), (acc, v) -> acc + v) > 0,
         |       shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT))),
         |  CAST(0 AS BIGINT), (acc, bit) -> acc + bit)""".stripMargin)

  /** X2c — n-gram Jaccard pairs: explode distinct shingles, self-join on
   * the shingle (shuffle on shingle hash — the inverted-index pattern),
   * count co-occurrences, then Jaccard = |∩| / (|A| + |B| − |∩|). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String, minCommon: Long): DataFrame = {
    val shingled = df
      .select(col(idCol), explode(array_distinct(shingleHashes(textCol))).as("shingle"))
    val counts = shingled.groupBy(idCol).agg(count(lit(1)).as("n_sh"))

    val a = shingled.withColumnRenamed(idCol, "id_a")
    val b = shingled.withColumnRenamed(idCol, "id_b")
    val common = a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)

    common
      .join(counts.withColumnRenamed(idCol, "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(counts.withColumnRenamed(idCol, "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")).cast("double"))
  }
}
