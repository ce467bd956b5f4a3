package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/**
 * Hash-aggregable ARGMIN over a (dist, id) pair — the r18 replacement for
 * the `min(struct(dist, id))` idiom at the four E-step/encoding argmin
 * sites (graft.ext.Similarity: assignToCentroids, pqCodes, kmeansUpdate,
 * kmeansReassign).
 *
 * WHY: `min` over a STRUCT is not hash-aggregable in Spark (a struct
 * aggregation buffer is not a mutable primitive), so every argmin
 * `groupBy(key).agg(min(struct(dist, id)))` planned as SortAggregate —
 * partial SORT + exchange + final SORT, outside the whole-stage-codegen
 * hash path. This aggregate keeps the SAME lexicographic (dist, id)
 * minimum but carries the pair as TWO primitive buffer slots
 * (bestDist, bestId), so the planner picks HashAggregate with map-side
 * partial combine and codegen (guide §4: prefer
 * codegen-friendly/DeclarativeAggregate forms on hot paths; measured in
 * BenchAB probe_argmin: kmeans_assign 0.91 s → 0.40 s at sf0.1).
 *
 * Semantics (pinned against `min(struct(dist, id))` in ArgMinPairSpec):
 * the (dist, id)-lexicographically smallest pair of the group, ties on
 * dist broken by the smaller id — identical to the struct form on
 * NON-NULL inputs, which all four call sites guarantee by construction
 * (distances are arithmetic over non-null embedding columns; ids are
 * non-null keys). Rows where `dist` or `id` IS null are ignored, like
 * every other Spark aggregate — this differs from min(struct(...)),
 * whose non-null outer struct would rank null FIELDS first; do not swap
 * this in where null inputs can occur and that ordering was relied on.
 * An all-null (or empty) group evaluates to NULL like `min` does.
 *
 * Result type: struct<dist, id> with the input expressions' types —
 * callers read `m.dist` / `m.id`.
 */
case class ArgMinPair(dist: Expression, id: Expression)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(dist, id)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("dist", dist.dataType, nullable = true),
    StructField("id", id.dataType, nullable = true)))
  override def prettyName: String = "argmin_pair"

  private lazy val bestDist = AttributeReference("bestDist", dist.dataType)()
  private lazy val bestId = AttributeReference("bestId", id.dataType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bestDist, bestId)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, dist.dataType), Literal.create(null, id.dataType))

  /** (d2, i2) strictly better than the (possibly null) buffer (d1, i1). */
  private def better(d1: Expression, i1: Expression,
      d2: Expression, i2: Expression): Expression =
    And(And(IsNotNull(d2), IsNotNull(i2)),
      Or(IsNull(d1),
        Or(LessThan(d2, d1), And(EqualTo(d2, d1), LessThan(i2, i1)))))

  override lazy val updateExpressions: Seq[Expression] = {
    val b = better(bestDist, bestId, dist, id)
    Seq(If(b, dist, bestDist), If(b, id, bestId))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val b = better(bestDist.left, bestId.left, bestDist.right, bestId.right)
    Seq(If(b, bestDist.right, bestDist.left), If(b, bestId.right, bestId.left))
  }

  override lazy val evaluateExpression: Expression = If(IsNull(bestId),
    Literal.create(null, dataType),
    CreateNamedStruct(Seq(Literal("dist"), bestDist, Literal("id"), bestId)))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArgMinPair =
    copy(dist = newChildren(0), id = newChildren(1))
}

object ArgMinPair {
  /** `argmin(dist, id)` as a Column aggregate: struct<dist, id> of the
   * lexicographically (dist, id)-smallest pair in the group. */
  def argmin(dist: Column, id: Column): Column =
    ExpressionUtils.column(ArgMinPair(
      ExpressionUtils.expression(dist),
      ExpressionUtils.expression(id)).toAggregateExpression())
}
