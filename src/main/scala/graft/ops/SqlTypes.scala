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
}
