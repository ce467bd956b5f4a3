package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Data-layout operators: Z-order (Morton) clustering keys. Writing a
 * table range-partitioned and sorted by the interleaved key gives every
 * file a tight min/max envelope on BOTH dimensions, so scan-time
 * predicate pushdown on either column prunes most files — the standard
 * multi-dimensional clustering trick (Delta/Iceberg OPTIMIZE ZORDER) for
 * 100 TB fact tables queried by more than one key.
 *
 * Everything is plain shift/mask arithmetic on longs (codegen'd
 * built-ins, no UDF) and is mirrored verbatim in the DuckDB oracle.
 */
object Layout {

  /** Spread the low 16 bits of `x` to even bit positions 0,2,..,30 via
   * the magic-mask doubling sequence (public-domain "interleave bits by
   * binary magic numbers" bit hack). */
  def spread16(x: Column): Column = {
    val s0 = x.bitwiseAND(lit(0xFFFFL))
    val s1 = (s0.bitwiseOR(shiftleft(s0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code interleaving the low 16 bits of two coordinates:
   * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. Adjacent
   * codes are adjacent in BOTH dimensions — sorting by this key is the
   * clustering. */
  def zorder2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** The same spread as [[spread16]] in DuckDB SQL, for oracle mirrors. */
  def spread16Sql(x: String): String = {
    val s0 = s"($x & 65535)"
    val s1 = s"((($s0) | (($s0) << 8)) & 16711935)"
    val s2 = s"((($s1) | (($s1) << 4)) & 252645135)"
    val s3 = s"((($s2) | (($s2) << 2)) & 858993459)"
    s"((($s3) | (($s3) << 1)) & 1431655765)"
  }

  def zorder2Sql(x: String, y: String): String =
    s"(${spread16Sql(x)} | (${spread16Sql(y)} << 1))"
}
