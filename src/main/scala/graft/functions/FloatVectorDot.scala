package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/**
 * Codegen'd dot product over two `array<float>` columns — the custom
 * Catalyst `Expression` path for the X3 similarity kernel
 * (SURVEY.md §7.4: "codegen'd cosine kernel for X3 at 100 TB").
 *
 * Lives under `org.apache.spark.sql` because the `Expression -> Column`
 * bridge (`classic.ExpressionUtils`) and `AbstractDataType` are
 * `private[sql]` in Spark 4 — the established packaging pattern for
 * out-of-tree Catalyst expressions.
 *
 * Semantics are identical to the declarative form
 * `aggregate(zip_with(a, b, (x, y) -> double(x)*double(y)), 0d, +)`
 * — a left-to-right double accumulation, so results are bit-for-bit the
 * same as both the higher-order-function formulation and the DuckDB
 * oracle's list_reduce mirror. The generated code is a tight primitive
 * loop (no per-element lambda dispatch, no intermediate array), which is
 * what makes brute-force and blocked cosine search CPU-bound rather than
 * interpreter-bound on wide scans.
 */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatVectorDot {
  /** Column-API entry point (no session registration required). */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatVectorDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
