package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.graft.{CassandraMurmur3Token, Murmur3Ring}
import com.google.common.hash.Hashing

class Murmur3RingSpec extends SparkSpec {
  import spark.implicits._

  test("canonical variant matches Guava murmur3_128 bit-for-bit") {
    // exhaustive-ish sample across byte patterns, including high-bit bytes
    val keys = (Seq(0L, 1L, 127L, 128L, 255L, 256L, 65535L, Long.MaxValue, Long.MinValue, -1L, -256L) ++
      (0 until 1000).map(i => i * 2654435761L + 17L)).distinct
    val guava = Hashing.murmur3_128(0)
    keys.foreach { k =>
      val bytes = Murmur3Ring.serializeBigint(k)
      val expected = guava.hashBytes(bytes).asLong()
      val got = Murmur3Ring.hash64(bytes, cassandraSigned = false)
      assert(got == expected, s"key $k: got $got expected $expected")
    }
  }

  test("signed (cassandra) variant equals canonical exactly when no tail byte has the high bit") {
    val lowByteKeys = (0 until 500).map { i =>
      // build keys whose every big-endian byte is < 0x80
      (0 until 8).map(b => ((i * 31 + b * 7) % 128).toLong << (8 * b)).reduce(_ | _)
    }
    lowByteKeys.foreach { k =>
      val bytes = Murmur3Ring.serializeBigint(k)
      assert(Murmur3Ring.hash64(bytes, cassandraSigned = true) ==
        Murmur3Ring.hash64(bytes, cassandraSigned = false))
    }
    // and differs for at least some high-bit keys (the quirk is real)
    val highBit = Seq(-1L, 255L, Long.MinValue, 0x80L)
    assert(highBit.exists { k =>
      val b = Murmur3Ring.serializeBigint(k)
      Murmur3Ring.hash64(b, cassandraSigned = true) != Murmur3Ring.hash64(b, cassandraSigned = false)
    })
  }

  test("expression evaluates the token distributed, interpreted == codegen == scala") {
    val df = spark.range(0, 10000).select($"id".as("pk"))
    val rows = df.select($"pk", CassandraMurmur3Token.token($"pk").as("t"))
      .as[(Long, Long)].collect()
    rows.foreach { case (k, t) => assert(t == Murmur3Ring.tokenOfBigint(k)) }
    // tokens spread over the ring (both signs present)
    assert(rows.count(_._2 < 0) > 1000 && rows.count(_._2 > 0) > 1000)
  }
}
