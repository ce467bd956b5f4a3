package graft.ops

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Shared type predicates for the deterministic-survivor operators. */
object SqlTypes {

  /** Whether a column of this type may join a window ORDER BY: MapType at
   * any nesting depth is rejected by Spark's sort. Used by both
   * deterministic-survivor paths (Dedup.exactKeep and
   * Upsert.lastWriterWins) so the rule cannot silently diverge between
   * them; rows identical on key + tiebreaks + every orderable column but
   * differing inside a map stay partition-order dependent — documented
   * residual in both call sites. */
  def orderable(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case s: StructType => s.fields.forall(f => orderable(f.dataType))
    case a: ArrayType => orderable(a.elementType)
    case _ => true
  }

  /** Fail fast when a caller-supplied top-k limit would silently turn
   * off Spark's WindowGroupLimit optimization: the single-window top-k
   * form used by the rank/shortlist paths bounds the shuffle (a PARTIAL
   * per-partition top-k before the exchange) only when the rank limit is
   * AT OR BELOW `spark.sql.optimizer.windowGroupLimitThreshold`
   * (default 1000; InferWindowGroupLimit in catalyst 4.1.2 plants the
   * partial when `limit <= threshold` and is FULLY DISABLED at
   * threshold = -1). Above it — or with the rule disabled — results
   * stay correct but whole groups funnel through one reducer: the
   * documented no-hot-reducer scale posture breaks without any visible
   * signal, which is exactly the case this guard exists to catch, so a
   * disabled rule must fail too. A caller who really wants a larger k
   * raises the threshold conf alongside. */
  def requireWindowGroupLimit(df: org.apache.spark.sql.DataFrame, k: Int): Unit = {
    val threshold = df.sparkSession.conf
      .get("spark.sql.optimizer.windowGroupLimitThreshold", "1000").toInt
    require(threshold >= 0 && k <= threshold,
      s"top-k limit $k would not plant a partial per-partition top-k " +
        s"(spark.sql.optimizer.windowGroupLimitThreshold = $threshold" +
        (if (threshold < 0) ", i.e. InferWindowGroupLimit is disabled" else "") +
        "): whole groups would shuffle to one reducer; raise the threshold " +
        "conf if this k is intended")
  }

  /** Fail fast when an input already carries one of an operator's
   * internal-helper or output columns: letting withColumn/unionByName/
   * drop proceed would silently overwrite, null-fill, or delete caller
   * data instead of erroring clearly. ONE shared definition (previously
   * copied per file, which let a third call site ship without it). */
  def requireFreeColumns(df: org.apache.spark.sql.DataFrame, names: Seq[String]): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already contains column(s) ${clash.mkString(", ")} — rename them before calling")
  }
}
