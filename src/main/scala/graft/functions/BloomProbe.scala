package org.apache.spark.sql.graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/**
 * Codegen'd Bloom-filter membership probe backed by a BROADCAST word
 * array — the large-filter path of `graft.ext.Bloom` (SURVEY.md §2.11
 * X28). The small-filter path embeds the words as a `typedLit` array in
 * the expression tree, which is exactly right at the 8 KiB default but
 * wrong past ~64 KiB: an expression-tree literal is re-serialized into
 * every plan fragment, logged plan string, and codegen pass, so a
 * 16 MiB production filter would bloat each of those by 16 MiB. Here the
 * expression holds only the `Broadcast` HANDLE — plan serialization
 * ships the handle (bytes, not the array), each executor fetches the
 * blocks once through the block manager, and the generated code reads a
 * cached `long[]` field.
 *
 * Bit semantics are identical to `Bloom.positions`/`Bloom.mightContain`
 * (Kirsch–Mitzenmacher double hashing, 31-bit pre-mask before the
 * golden-ratio stride mix, stride forced odd): `BloomProbe.contains` is
 * the JVM transcription of the same integer Column algebra, and
 * BloomSpec property-tests the two paths verdict-for-verdict.
 */
case class BloomProbeExpr(child: Expression, words: Broadcast[Array[Long]],
    numBits: Int, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  // ImplicitCast, not the strict ExpectsInputTypes: the literal path's
  // pmod(h, lit) promotes an int hash column implicitly, and behavior
  // must not flip on filter size
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  override def nullSafeEval(h: Any): Any =
    BloomProbeExpr.contains(words.value, h.asInstanceOf[Long], numBits, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the broadcast handle lands in the codegen references array; the
    // per-instance mutable state dereferences it ONCE (instance init,
    // i.e. once per task) so the per-row path is a plain long[] index
    val bcast = ctx.addReferenceObj("bloomBcast", words)
    val arr = ctx.addMutableState("long[]", "bloomWords",
      v => s"$v = (long[]) ((org.apache.spark.broadcast.Broadcast) $bcast).value();")
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = org.apache.spark.sql.graft.BloomProbeExpr.contains($arr, $h, $numBits, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomProbeExpr {

  /** Knuth's 32-bit golden-ratio odd constant — must match
   * `graft.ext.Bloom.Phi32`. */
  private final val Phi32 = 2654435761L

  /** JVM mirror of the `Bloom.positions` Column algebra: h1 = pmod(h, m);
   * stride = pmod(pmod(h, 2^31)·φ, m) | 1; pos_j = pmod(h1 + j·stride, m).
   * `floorMod` IS SQL `pmod` for positive moduli, and the Java `<<` masks
   * its shift count to 6 bits exactly like SQL `shiftleft` on bigint, so
   * every intermediate matches the literal-embedding path bit-for-bit. */
  def contains(words: Array[Long], h: Long, numBits: Int, k: Int): Boolean = {
    val m = numBits.toLong
    val h1 = java.lang.Math.floorMod(h, m)
    val stride = java.lang.Math.floorMod(java.lang.Math.floorMod(h, 1L << 31) * Phi32, m) | 1L
    var j = 0
    while (j < k) {
      val pos = java.lang.Math.floorMod(h1 + j * stride, m)
      if ((words((pos >> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L) return false
      j += 1
    }
    true
  }

  def probe(words: Broadcast[Array[Long]], h: Column, numBits: Int, k: Int): Column =
    ExpressionUtils.column(
      BloomProbeExpr(ExpressionUtils.expression(h), words, numBits, k))
}
