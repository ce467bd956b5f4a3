package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for hot join keys (SURVEY.md §7.5.8, the 100 TB
 * posture): when one key dominates (the classic hot-partition Cassandra
 * table), a plain hash join lands the whole key on one reducer. Salting
 * splits every skewed-side row across `salt` sub-keys and replicates the
 * small side once per sub-key, so the hot key spreads over `salt`
 * reducers. AQE's skew-join handles moderate skew automatically; explicit
 * salting is for the pathological keys AQE cannot split (single giant
 * build-side group).
 */
object Salting {

  /**
   * Equi-join `skewed ⋈ dim` on `keys`, spreading each skewed key over
   * `salt` partitions. The dim side is exploded `salt`-fold (dim must be
   * the small side — its replication factor is `salt`), so the join
   * result is IDENTICAL for every salt assignment; the salt only decides
   * which reducer each skewed row lands on.
   *
   * The skewed-side salt is therefore a round-robin counter per input
   * partition (`monotonically_increasing_id mod salt`), NOT a hash of the
   * row: a content hash sends literal duplicate rows of the hot key —
   * exactly the mass-duplicated shape that makes a key hot — to ONE salt
   * value, re-concentrating the skew it was meant to spread, and
   * `xxhash64` rejects MapType columns outright. Round-robin spreads
   * duplicates evenly by construction and accepts any schema. Reruns may
   * assign different salts, but since results are salt-invariant that
   * only re-balances work, never changes output.
   */
  def saltedEquiJoin(skewed: DataFrame, dim: DataFrame, keys: Seq[String], salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val saltedLeft = skewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val saltedDim = dim.withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    saltedLeft.join(saltedDim, keys :+ "__salt", "inner").drop("__salt")
  }
}
