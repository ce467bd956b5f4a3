package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.functions.concat
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Exact Cassandra `Murmur3Partitioner` ring token over arbitrary partition
 * keys — the live-cluster-parity upgrade over the harness's arithmetic
 * token stand-in (SURVEY.md §7.4; `[upstream]` CDM's range scans run
 * `WHERE token(pk) >= ? AND token(pk) <= ?` against this ring).
 *
 * Semantics reproduced from public documentation of the partitioner:
 * MurmurHash3 x64/128 (full block loop + tail), seed 0, first 64-bit half,
 * `Long.MIN_VALUE` normalized to `Long.MAX_VALUE`, over the key's CQL
 * serialization — 8-byte big-endian for `bigint`, 4-byte big-endian for
 * `int`, UTF-8 bytes for `text`, raw bytes for `blob`; MULTI-column
 * partition keys hash the CompositeType serialization (per component:
 * 2-byte big-endian length, bytes, 0x00 end-of-component). Cassandra's
 * hash deviates from canonical murmur3 in one well-known way: TAIL bytes
 * are promoted to long with SIGN extension (no `& 0xff`; block reads are
 * masked normally) — [[Murmur3Ring.hash64]] implements both variants, and
 * the test suite pins the canonical variant bit-for-bit against Guava's
 * `murmur3_128` across multi-block inputs, validating everything except
 * the one-line signed-promotion delta.
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

  /** murmur3 x64/128 (h1 half) of an arbitrary-length input, seed 0.
   * `cassandraSigned` selects Cassandra's sign-extending TAIL promotion;
   * false gives canonical murmur3 (Guava-comparable). */
  def hash64(bytes: Array[Byte], cassandraSigned: Boolean): Long = {
    val length = bytes.length
    val nblocks = length >>> 4
    // block reads are little-endian and byte-masked in Cassandra too —
    // only the tail has the signed quirk
    @inline def block(off: Int): Long = {
      var k = 0L
      var j = 0
      while (j < 8) { k |= (bytes(off + j) & 0xffL) << (8 * j); j += 1 }
      k
    }
    @inline def tb(i: Int): Long =
      if (cassandraSigned) bytes(i).toLong else (bytes(i) & 0xffL)

    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < nblocks * 16) {
      var k1 = block(i)
      var k2 = block(i + 8)
      k1 *= C1; k1 = rotl64(k1, 31); k1 *= C2; h1 ^= k1
      h1 = rotl64(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = rotl64(k2, 33); k2 *= C1; h2 ^= k2
      h2 = rotl64(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 16
    }

    val t = nblocks * 16
    val rem = length - t
    if (rem > 8) {
      var k2 = 0L
      var j = rem - 1
      while (j >= 8) { k2 ^= tb(t + j) << (8 * (j - 8)); j -= 1 }
      k2 *= C2; k2 = rotl64(k2, 33); k2 *= C1; h2 ^= k2
    }
    if (rem > 0) {
      var k1 = 0L
      var j = math.min(rem, 8) - 1
      while (j >= 0) { k1 ^= tb(t + j) << (8 * j); j -= 1 }
      k1 *= C1; k1 = rotl64(k1, 31); k1 *= C2; h1 ^= k1
    }

    h1 ^= length.toLong; h2 ^= length.toLong
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

  /** CQL int serialization: 4 bytes, big-endian. */
  def serializeInt(key: Int): Array[Byte] = {
    val out = new Array[Byte](4)
    var i = 0
    while (i < 4) { out(i) = (key >>> (24 - 8 * i)).toByte; i += 1 }
    out
  }

  /** One CompositeType component: 2-byte big-endian length, the bytes,
   * then the 0x00 end-of-component marker (public Cassandra composite
   * key layout; applies only to MULTI-column partition keys). */
  def compositeWrap(component: Array[Byte]): Array[Byte] = {
    val n = component.length
    require(n <= 0xffff, s"composite component too large: $n bytes")
    val out = new Array[Byte](n + 3)
    out(0) = (n >>> 8).toByte
    out(1) = n.toByte
    System.arraycopy(component, 0, out, 2, n)
    out(n + 2) = 0
    out
  }

  /** The partitioner token of a serialized key: cassandra-variant h1,
   * MIN_VALUE normalized. */
  def tokenOfBytes(bytes: Array[Byte]): Long = {
    val t = hash64(bytes, cassandraSigned = true)
    if (t == Long.MinValue) Long.MaxValue else t
  }

  def tokenOfBigint(key: Long): Long = tokenOfBytes(serializeBigint(key))

  def tokenOfUtf8(key: UTF8String): Long = tokenOfBytes(key.getBytes)
}

/** Catalyst expression: the ring token of a single-column partition key
 * (bigint / int / text / blob serializations supported). */
case class CassandraMurmur3Token(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cassandra_murmur3_token"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cassandra_murmur3_token does not support ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType    => Murmur3Ring.tokenOfBigint(input.asInstanceOf[Long])
    case IntegerType => Murmur3Ring.tokenOfBytes(Murmur3Ring.serializeInt(input.asInstanceOf[Int]))
    case StringType  => Murmur3Ring.tokenOfUtf8(input.asInstanceOf[UTF8String])
    case BinaryType  => Murmur3Ring.tokenOfBytes(input.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ring = "org.apache.spark.sql.graft.Murmur3Ring"
    val call = child.dataType match {
      case LongType    => (x: String) => s"$ring.tokenOfBigint($x)"
      case IntegerType => (x: String) => s"$ring.tokenOfBytes($ring.serializeInt($x))"
      case StringType  => (x: String) => s"$ring.tokenOfUtf8($x)"
      case BinaryType  => (x: String) => s"$ring.tokenOfBytes($x)"
    }
    defineCodeGen(ctx, ev, call)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Catalyst expression: CQL serialization of one key component to binary
 * (the building block for composite partition keys). */
case class CqlSerialize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "cql_serialize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cql_serialize does not support ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType    => Murmur3Ring.serializeBigint(input.asInstanceOf[Long])
    case IntegerType => Murmur3Ring.serializeInt(input.asInstanceOf[Int])
    case StringType  => input.asInstanceOf[UTF8String].getBytes
    case BinaryType  => input.asInstanceOf[Array[Byte]]
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ring = "org.apache.spark.sql.graft.Murmur3Ring"
    val call = child.dataType match {
      case LongType    => (x: String) => s"$ring.serializeBigint($x)"
      case IntegerType => (x: String) => s"$ring.serializeInt($x)"
      case StringType  => (x: String) => s"$x.getBytes()"
      case BinaryType  => (x: String) => s"$x"
    }
    defineCodeGen(ctx, ev, call)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Catalyst expression: composite-component framing of serialized bytes. */
case class CompositeWrap(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "composite_wrap"

  override def nullSafeEval(input: Any): Any =
    Murmur3Ring.compositeWrap(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"org.apache.spark.sql.graft.Murmur3Ring.compositeWrap($x)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CassandraMurmur3Token {
  /** Token of a single-column partition key (bigint/int/text/blob). */
  def token(pk: Column): Column =
    ExpressionUtils.column(CassandraMurmur3Token(ExpressionUtils.expression(pk)))

  /** Token of a (possibly composite) partition key: a single column
   * hashes its raw CQL serialization; multiple columns hash the
   * CompositeType concatenation — exactly the bytes a live cluster
   * hashes for a multi-column partition key. */
  def tokenOfKey(pkCols: Seq[Column]): Column = {
    require(pkCols.nonEmpty, "partition key needs at least one column")
    if (pkCols.sizeIs == 1) token(pkCols.head)
    else {
      val framed = pkCols.map { c =>
        ExpressionUtils.column(
          CompositeWrap(CqlSerialize(ExpressionUtils.expression(c))))
      }
      ExpressionUtils.column(CassandraMurmur3Token(
        ExpressionUtils.expression(concat(framed: _*))))
    }
  }
}
