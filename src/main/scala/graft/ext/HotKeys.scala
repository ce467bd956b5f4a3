package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Hot-key-safe per-key size caps / document-frequency ceilings — the one
 * enforcement shape shared by every bucketed candidate generator in this
 * library (LSH band buckets, simhash pigeonhole blocks, linkage blocks,
 * shingle/term df ceilings, chunk df).
 *
 * Why not `count(*).over(Window.partitionBy(key))`: a window cannot
 * partially aggregate OR be split across tasks, so a Zipfian-hot key (a
 * stop shingle, a boilerplate chunk, a dense LSH bucket — exactly the
 * keys the caps exist to drop) funnels ALL of its rows through the one
 * reducer that owns it, pays a per-partition sort, and only THEN gets
 * dropped. Invisible at sf0.1; a straggler/spill at 100 TB when one key
 * carries 1 % of corpus mass (measured in the `bigram_surprisal_zipf`
 * ScaleBench family before this shape was fixed in
 * [[TextOps.bigramSurprisal]] — this object applies the same fix
 * library-wide).
 *
 * The safe shape:
 *  1. `groupBy(key).count()` — map-side combined, so a hot key collapses
 *     to ONE row per map task before its (tiny) count shuffle;
 *  2. keep only keys with count > cap — by construction there are at
 *     most `totalRows / cap` of them, and in practice a handful (they
 *     are the pathological mass concentrations the cap targets);
 *  3. broadcast that over-cap key list and LEFT ANTI join it map-side —
 *     the hot key's instance rows then never shuffle at all.
 *
 * Null keys match the window semantics exactly: the anti-join condition
 * uses null-safe equality (`<=>`), so an over-cap null-key group is
 * dropped just as `Window.partitionBy` (which groups nulls together)
 * would have dropped it.
 *
 * Bound on the broadcast: |over-cap keys| <= totalRows / cap. If that
 * ever exceeds the broadcast budget, more than `broadcastLimit × cap`
 * rows are pathological mass — a data-quality fire the pipeline should
 * surface, not silently absorb; the join-back face
 * ([[withKeyCounts]], the [[TextOps.bigramSurprisal]] idiom) is the
 * escape hatch because a shuffled join, unlike a window, stays
 * AQE-skew-splittable.
 */
object HotKeys {

  /**
   * Drop every row whose key combination appears more than `cap` times
   * in `df`. Bit-equivalent to
   * `withColumn(n, count(*).over(Window.partitionBy(keys))).filter(n <= cap)`
   * but the hot keys' rows never shuffle (see object doc).
   */
  def dropOverCap(df: DataFrame, keyCols: Seq[String], cap: Long): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(cap >= 1, s"cap must be positive, got $cap")
    val over = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__hk_n"))
      .filter(col("__hk_n") > cap)
      .select(keyCols.map(k => col(k).as(s"__hk_$k")): _*)
    val cond = keyCols.map(k => col(k) <=> col(s"__hk_$k")).reduce(_ && _)
    df.join(broadcast(over), cond, "left_anti")
  }

  /**
   * Attach the per-key row count as `countCol` — for callers that need
   * the count as a VALUE (df-weighted flags, boilerplate ratios), not
   * just a cap filter. Map-side-combined `groupBy` count table joined
   * back SHUFFLE_HASH (a sort-merge join would re-sort the full instance
   * stream; a hash build of the tiny count side costs neither sort), and
   * the join — unlike a window — is AQE-skew-splittable: a hot key's
   * instance rows divide across tasks with the one matching count row
   * replicated. Inner join on a null-safe key equality so null-key rows
   * keep their group count, matching `Window.partitionBy` semantics.
   */
  def withKeyCounts(df: DataFrame, keyCols: Seq[String], countCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as(countCol))
      .select(col(countCol) +: keyCols.map(k => col(k).as(s"__hk_$k")): _*)
    val cond = keyCols.map(k => col(k) <=> col(s"__hk_$k")).reduce(_ && _)
    df.join(counts.hint("SHUFFLE_HASH"), cond)
      .drop(keyCols.map(k => s"__hk_$k"): _*)
  }
}
