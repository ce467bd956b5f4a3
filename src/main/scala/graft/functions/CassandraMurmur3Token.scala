package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Exact Cassandra `Murmur3Partitioner` ring token of a `bigint` partition
 * key — the live-cluster-parity upgrade over the harness's arithmetic
 * token stand-in (SURVEY.md §7.4 deferred item; `[upstream]` CDM's range
 * scans run `WHERE token(pk) >= ? AND token(pk) <= ?` against this ring).
 *
 * Semantics reproduced from public documentation of the partitioner
 * (MurmurHash3 x64/128, seed 0, first 64-bit half, `Long.MIN_VALUE`
 * normalized to `Long.MAX_VALUE`) over the key's 8-byte big-endian
 * CQL `bigint` serialization. Cassandra's hash deviates from canonical
 * murmur3 in one well-known way: tail bytes are promoted to long with
 * SIGN extension (no `& 0xff`) — [[Murmur3Ring.hash64]] implements both
 * variants, and the test suite pins the canonical variant bit-for-bit
 * against Guava's `murmur3_128` (same core mixing/finalization), which
 * validates everything except the one-line signed-promotion delta.
 */
object Murmur3Ring {

  private val C1 = 0x87c37b91114253d5L
  private val C2 = 0x4cf5ad432745937fL

  @inline private def rotl64(v: Long, n: Int): Long = (v << n) | (v >>> (64 - n))

  @inline private def fmix(kIn: Long): Long = {
    var k = kIn
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  /** murmur3 x64/128 (h1 half) of an 8-byte input, seed 0.
   * `cassandraSigned` selects Cassandra's sign-extending tail promotion;
   * false gives canonical murmur3 (Guava-comparable). */
  def hash64(bytes: Array[Byte], cassandraSigned: Boolean): Long = {
    require(bytes.length == 8)
    def b(i: Int): Long =
      if (cassandraSigned) bytes(i).toLong else (bytes(i) & 0xffL)
    var k1 = 0L
    k1 ^= b(7) << 56
    k1 ^= b(6) << 48
    k1 ^= b(5) << 40
    k1 ^= b(4) << 32
    k1 ^= b(3) << 24
    k1 ^= b(2) << 16
    k1 ^= b(1) << 8
    k1 ^= b(0)
    k1 *= C1; k1 = rotl64(k1, 31); k1 *= C2

    var h1 = 0L ^ k1 // seed 0, tail-only input
    var h2 = 0L
    h1 ^= 8L; h2 ^= 8L
    h1 += h2; h2 += h1
    h1 = fmix(h1); h2 = fmix(h2)
    h1 += h2
    h1
  }

  /** CQL bigint serialization: 8 bytes, big-endian. */
  def serializeBigint(key: Long): Array[Byte] = {
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = (key >>> (56 - 8 * i)).toByte; i += 1 }
    out
  }

  /** The partitioner token: cassandra-variant h1, MIN_VALUE normalized. */
  def tokenOfBigint(key: Long): Long = {
    val t = hash64(serializeBigint(key), cassandraSigned = true)
    if (t == Long.MinValue) Long.MaxValue else t
  }
}

/** Catalyst expression form of [[Murmur3Ring.tokenOfBigint]]. */
case class CassandraMurmur3Token(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cassandra_murmur3_token"

  override def nullSafeEval(input: Any): Any =
    Murmur3Ring.tokenOfBigint(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"org.apache.spark.sql.graft.Murmur3Ring.tokenOfBigint($x)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CassandraMurmur3Token {
  def token(pk: Column): Column =
    ExpressionUtils.column(CassandraMurmur3Token(ExpressionUtils.expression(pk)))
}
