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
   * `salt` partitions. The salt on the skewed side is a deterministic
   * function of the whole row (xxhash64), so reruns produce identical
   * partitioning; the dim side is exploded `salt`-fold (dim must be the
   * small side — its replication factor is `salt`).
   */
  def saltedEquiJoin(skewed: DataFrame, dim: DataFrame, keys: Seq[String], salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val saltedLeft = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col).toIndexedSeq: _*), lit(salt)).cast("int"))
    val saltedDim = dim.withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    saltedLeft.join(saltedDim, keys :+ "__salt", "inner").drop("__salt")
  }
}
