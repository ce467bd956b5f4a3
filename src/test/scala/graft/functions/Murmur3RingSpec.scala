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

  test("general block loop matches Guava murmur3_128 over multi-block inputs") {
    val guava = Hashing.murmur3_128(0)
    val inputs: Seq[Array[Byte]] =
      (0 until 200).map { i =>
        // lengths 0..199 sweep every block/tail-length combination
        Array.tabulate(i)(j => ((i * 31 + j * 7) % 256).toByte)
      } ++ Seq("", "a", "customer#000000042", "x" * 15, "y" * 16, "z" * 17,
        "The quick brown fox jumps over the lazy dog").map(_.getBytes("UTF-8"))
    inputs.foreach { bytes =>
      val expected = guava.hashBytes(bytes).asLong()
      val got = Murmur3Ring.hash64(bytes, cassandraSigned = false)
      assert(got == expected, s"len ${bytes.length}: got $got expected $expected")
    }
  }

  test("known Cassandra token values for text keys") {
    // the partitioner's canonical example: token('hello') on a live
    // Murmur3Partitioner ring (low-bit ASCII, so signed == canonical and
    // Guava independently confirms it)
    val guava = Hashing.murmur3_128(0)
    val hello = "hello".getBytes("UTF-8")
    assert(Murmur3Ring.tokenOfBytes(hello) == guava.hashBytes(hello).asLong())
  }

  test("composite wrap frames components as len|bytes|0x00") {
    val w = Murmur3Ring.compositeWrap(Array[Byte](1, 2, 3))
    assert(w.toSeq == Seq[Byte](0, 3, 1, 2, 3, 0))
    val big = Murmur3Ring.compositeWrap(new Array[Byte](300))
    assert(big(0) == 1.toByte && big(1) == 44.toByte && big.length == 303)
  }

  test("tokenOfKey over text and composite keys evaluates distributed == scala") {
    val df = spark.read.parquet(s"$Sf/customer.parquet")
    val rows = df.select($"c_name", $"c_custkey",
        CassandraMurmur3Token.token($"c_name").as("t_text"),
        CassandraMurmur3Token.tokenOfKey(Seq($"c_custkey", $"c_name")).as("t_comp"))
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (name, key, tText, tComp) =>
      assert(tText == Murmur3Ring.tokenOfBytes(name.getBytes("UTF-8")))
      val composite =
        Murmur3Ring.compositeWrap(Murmur3Ring.serializeBigint(key)) ++
        Murmur3Ring.compositeWrap(name.getBytes("UTF-8"))
      assert(tComp == Murmur3Ring.tokenOfBytes(composite))
    }
    // distinct keys spread over both ring halves
    assert(rows.count(_._3 < 0) > 10 && rows.count(_._3 > 0) > 10)
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
