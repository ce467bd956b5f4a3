package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
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

  // mismatched lengths yield NULL, matching the HOF form bit-for-bit:
  // zip_with pads the shorter array with nulls, so aggregate's sum goes
  // null — truncating to min(len) here would instead return a
  // plausible-looking partial dot for a corrupted/mixed-dim table.
  // Likewise a NULL ELEMENT nulls the whole dot (the HOF's null product
  // poisons the fold): treating a null slot as 0.0 would score a
  // corrupted embedding as a plausible similarity and diverge from the
  // oracle. The null checks are only emitted when the array type says
  // elements can be null, so the dense-fixture hot loop stays tight.
  override def nullable: Boolean = true

  private lazy val elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (elementsNullable && (x.isNullAt(i) || y.isNullAt(i))) return null
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
      val nullCheck =
        if (elementsNullable)
          s"""if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** One-pass int8-quantization statistics over an array<float> embedding:
 * returns [scale, q_sum, max_err] where scale = max|v|,
 * q_i = floor(v_i·127/scale + 0.5), q_sum = Σq_i and max_err =
 * max|q_i·scale/127 − v_i| — the reconstruction-error accounting of a
 * vector store's compression step. Semantically identical to the
 * transform/aggregate HOF formulation (equivalence-tested), but a single
 * primitive loop instead of four interpreted lambda passes per row.
 * A zero vector (scale = 0) quantizes to all-zero codes with zero error. */
case class QuantizeInt8Stats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "quantize_int8_stats"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    var scale = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(arr.getFloat(i).toDouble)
      if (a > scale) scale = a
      i += 1
    }
    var qSum = 0.0
    var maxErr = 0.0
    if (scale > 0) {
      i = 0
      while (i < n) {
        val v = arr.getFloat(i).toDouble
        val q = math.floor(v * 127.0 / scale + 0.5)
        qSum += q
        val e = math.abs(q * scale / 127.0 - v)
        if (e > maxErr) maxErr = e
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(scale, qSum, maxErr))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val a = ctx.freshName("a")
      val v = ctx.freshName("v")
      val q = ctx.freshName("q")
      val e = ctx.freshName("e")
      val scale = ctx.freshName("scale")
      val qSum = ctx.freshName("qSum")
      val maxErr = ctx.freshName("maxErr")
      s"""
         |int $n = $x.numElements();
         |double $scale = 0.0, $qSum = 0.0, $maxErr = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $a = Math.abs((double) $x.getFloat($i));
         |  if ($a > $scale) $scale = $a;
         |}
         |if ($scale > 0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $v = (double) $x.getFloat($i);
         |    double $q = Math.floor($v * 127.0 / $scale + 0.5);
         |    $qSum += $q;
         |    double $e = Math.abs($q * $scale / 127.0 - $v);
         |    if ($e > $maxErr) $maxErr = $e;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  new double[]{$scale, $qSum, $maxErr});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FloatVectorDot {
  /** Column-API entry point (no session registration required). */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatVectorDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** [scale, q_sum, max_err] of int8 scalar quantization, one pass. */
  def quantizeInt8Stats(emb: Column): Column =
    ExpressionUtils.column(QuantizeInt8Stats(ExpressionUtils.expression(emb)))
}
