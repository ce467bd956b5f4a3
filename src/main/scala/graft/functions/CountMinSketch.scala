package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Count-min sketch as a custom typed aggregate — the `Aggregator`
 * tier of the extension surface (SURVEY.md §2.12): partial sketches
 * build per partition (`reduce`), merge by elementwise addition
 * (`merge` — commutative and associative, so the result is
 * partition-order INDEPENDENT, unlike e.g. Misra-Gries summaries whose
 * counts depend on merge order). That determinism is what lets the
 * DuckDB oracle mirror the sketch arithmetic cell-for-cell.
 *
 * Scale posture: the sketch is a fixed d×w long array (d=4, w=512 →
 * 16 KiB) regardless of input size — the whole point vs exact counts at
 * 100 TB: heavy-hitter frequencies in one pass, one tiny merge tree, no
 * shuffle of per-token state. Estimates overcount only (min over d
 * independent rows bounds collision error by n/w per row).
 *
 * Hash family: h_i(x) = ((a_i·x + b_i) mod P) mod w over NON-NEGATIVE
 * inputs (the engine's token hashes) — plain `%` equals `pmod` on both
 * engines for non-negative operands, and a_i·x stays well under 2^63
 * for x < P.
 */
object CountMinSketch {
  val Depth = 4
  val Width = 512
  val P = 1000000007L
  val A: Array[Long] = Array(131L, 10007L, 92821L, 486187739L)
  val B: Array[Long] = Array(17L, 257L, 8191L, 131071L)

  def bucket(i: Int, x: Long): Int =
    (((A(i) * (x % P) + B(i)) % P) % Width).toInt

  /** SQL-text mirror of [[bucket]] for the DuckDB oracle and the Spark
   * probe-lookup side (identical integer arithmetic on both engines). */
  def bucketSql(i: Int, x: String): String =
    s"((${A(i)} * ($x % $P) + ${B(i)}) % $P) % $Width"

  final class Agg extends Aggregator[Long, Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](Depth * Width)
    override def reduce(buf: Array[Long], x: Long): Array[Long] = {
      var i = 0
      while (i < Depth) { buf(i * Width + bucket(i, x)) += 1L; i += 1 }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    // ExpressionEncoder, NOT Encoders.kryo: the Kryo path (a) serializes
    // through reflection that needs `--add-opens java.base/java.nio` —
    // the aggregation failed outright on a plain JDK-17 JVM without
    // spark-submit's injected module options — and (b) writes an opaque
    // binary blob where the expression encoder writes a primitive long
    // array natively. Same buffer contents, no reflective surface.
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column-usable form: `df.agg(CountMinSketch.udafFn(col("tok")))`. */
  lazy val udafFn: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new Agg, Encoders.scalaLong)
}
