package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MapType

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

  /** Whether a field can join a groupBy/hash: orderable outright, or a
   * top-level map whose canonical entry array is orderable. */
  private def collapsible(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case m: MapType => SqlTypes.orderable(m.keyType) && SqlTypes.orderable(m.valueType)
    case other => SqlTypes.orderable(other)
  }

  /**
   * Equi-join `skewed ⋈ dim` on `keys`, spreading each skewed key over
   * `salt` partitions. The dim side is exploded `salt`-fold (dim must be
   * the small side — its replication factor is `salt`), so the join
   * result is IDENTICAL for every salt assignment; the salt only decides
   * which reducer each skewed row lands on.
   *
   * The salt must be DETERMINISTIC: a `monotonically_increasing_id`- or
   * `rand`-based salt is recomputed differently when a shuffle-map task
   * retries after a fetch failure, so already-fetched reducer input and
   * recomputed input disagree — rows silently lost or duplicated (the
   * indeterminate-shuffle hazard Spark only mitigates for round-robin
   * repartition). So the salt here is `xxhash64` over the row CONTENT.
   * A content hash alone would re-concentrate literal duplicate rows of
   * the hot key — exactly the mass-duplicated shape that makes a key hot
   * — onto ONE salt value, so duplicates are first COLLAPSED
   * (groupBy all columns → `__dup` count; map-side partial aggregation
   * absorbs the mass before it ever crosses the wire), joined once, and
   * re-exploded `__dup`-fold after the join. The duplicate mass thus
   * never crosses a shuffle at all — strictly better than spreading it.
   *
   * MapType columns cannot join a groupBy or a hash directly; they are
   * canonicalized to `array_sort(map_entries(m))` for the collapse and
   * the salt, then restored with `map_from_entries`. If a column is not
   * collapsible even via entries (a map nested inside a map), the
   * collapse step is skipped and the salt hashes only the orderable
   * columns — deterministic, but literal full-row duplicates then share
   * a salt (documented residual; pre-collapse such frames upstream).
   */
  def saltedEquiJoin(skewed: DataFrame, dim: DataFrame, keys: Seq[String], salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    SqlTypes.requireFreeColumns(skewed, Seq("__salt", "__dup", "__chunk", "__copy"))
    SqlTypes.requireFreeColumns(dim, Seq("__salt"))
    val saltedDim = dim.withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    val fields = skewed.schema.fields
    if (fields.forall(f => collapsible(f.dataType))) {
      // canonical grouping form: maps → sorted entry arrays
      val groupCols: Seq[Column] = fields.toSeq.map { f =>
        f.dataType match {
          case _: MapType => array_sort(map_entries(col(f.name))).as(f.name)
          case _ => col(f.name)
        }
      }
      val collapsed = skewed.groupBy(groupCols: _*).agg(count(lit(1)).as("__dup"))
      val salted = collapsed.withColumn("__salt",
        pmod(xxhash64(fields.toSeq.map(f => col(f.name)): _*), lit(salt.toLong)).cast("int"))
      // restore map columns from their canonical entries
      val restored = fields.collect { case f if f.dataType.isInstanceOf[MapType] => f }
        .foldLeft(salted) { (d, f) => d.withColumn(f.name, map_from_entries(col(f.name))) }
      // Two-level re-explosion: a single sequence(1, __dup) would build a
      // __dup-length array in one row — a 500M-duplicate hot key (exactly
      // the shape this operator exists for) means a multi-GB array in one
      // task, and Spark's sequence caps out near 2^31 elements anyway.
      // Chunking bounds every generated array at max(chunk, __dup/chunk):
      // ~4096 entries until __dup ~ 1.7e7, √__dup-ish beyond. Expansion
      // still streams through Generate (no buffering of the output).
      val chunk = 4096L
      restored.join(saltedDim, keys :+ "__salt", "inner")
        .withColumn("__chunk", explode(sequence(lit(0L), expr(s"(__dup - 1L) div ${chunk}L"))))
        .withColumn("__copy", explode(sequence(lit(1L),
          least(lit(chunk), col("__dup") - col("__chunk") * lit(chunk)))))
        .drop("__salt", "__dup", "__chunk", "__copy")
    } else {
      val hashable = fields.filter(f => SqlTypes.orderable(f.dataType)).toSeq.map(f => col(f.name))
      // zero orderable columns (e.g. key inside a map-of-maps row): a
      // constant salt is deterministic and correct (the dim side carries
      // every salt value), just unspread — degraded, never wrong
      val saltCol =
        if (hashable.isEmpty) lit(0)
        else pmod(xxhash64(hashable: _*), lit(salt.toLong)).cast("int")
      val salted = skewed.withColumn("__salt", saltCol)
      salted.join(saltedDim, keys :+ "__salt", "inner").drop("__salt")
    }
  }

  /**
   * The DIAGNOSTIC that decides whether [[saltedEquiJoin]] (or AQE skew
   * handling) is needed at all: the top-N join keys by row count with
   * their exact share of the table in integer micro-units (count ·10⁶
   * div total — no cross-engine float division). A key whose share
   * approaches 10⁶/shufflePartitions saturates one reducer; far beyond
   * it, one reducer IS the job's critical path.
   *
   * One map-side-combined groupBy over the keys, a broadcast of the
   * single-row total, TakeOrdered over the aggregate (never a full
   * sort) — safe to run on the full 100 TB input ahead of a join.
   */
  def keySkewAudit(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(topN > 0, s"topN must be positive, got $topN")
    SqlTypes.requireFreeColumns(df, Seq("n", "share_us", "__total"))
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    // grand total from the already-aggregated relation, NOT a second
    // full scan of df — the whole point of the diagnostic is that it
    // costs one pass over the input
    val total = counts.agg(sum("n").as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_us", expr("n * 1000000L div __total"))
      .drop("__total")
      .orderBy((col("n").desc +: keys.map(k => col(k).asc)): _*)
      .limit(topN)
  }
}
