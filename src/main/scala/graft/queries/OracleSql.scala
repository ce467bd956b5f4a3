package graft.queries

import graft.ext.Dedup

/**
 * Shared DuckDB mirrors of the engine's portable hash expressions. One
 * definition per formula: the Spark side lives in TextOps/Dedup, the
 * DuckDB side here — changing a formula means touching exactly one Scala
 * expression and one SQL mirror, never per-query copies.
 */
object OracleSql {

  /** Mirror of TextOps.tokenHashSql. */
// length() (characters), NOT strlen() (bytes): the Spark side uses
  // length(), and the two diverge on any multibyte token — which would
  // silently break every shingle/minhash/simhash/fingerprint oracle on
  // the first non-ASCII corpus
  def tokenHash(t: String): String =
    s"(ascii($t)*96 + ascii(right($t,1)) + length($t)*7)"

  /** Mirror of TextOps.prefixKey. */
  def prefixKey(n: Int = 3): String =
    s"array_to_string(string_split(text,' ')[1:$n], ' ')"

  /** Mirror of Dedup.withShingleHashes: 3-gram shingle hashes over the
   * whitespace tokenization (range(1, len-1) is empty for < 3 tokens,
   * matching the Spark-side guard). */
  val shingles: String =
    s"""list_transform(range(1, len(string_split(text,' ')) - 1),
       |  i -> CAST((${tokenHash("string_split(text,' ')[i]")} * 10007
       |           + ${tokenHash("string_split(text,' ')[i+1]")} * 131
       |           + ${tokenHash("string_split(text,' ')[i+2]")}) % ${Dedup.P} AS BIGINT))""".stripMargin

  /** Mirror of Dedup.withChunkHashes: fixed-stride token-chunk rolling
   * hashes (empty for documents shorter than one chunk, matching the
   * Spark-side `< chunkSize` guard). */
  def chunks(chunkSize: Int = 8): String =
    s"""CASE WHEN len(string_split(text,' ')) < $chunkSize THEN []
       |ELSE list_transform(range(0, len(string_split(text,' ')) // $chunkSize),
       |  c -> list_reduce(list_prepend(CAST(0 AS BIGINT),
       |         list_transform(range(1, ${chunkSize + 1}),
       |           k -> CAST(${tokenHash(s"string_split(text,' ')[c*$chunkSize+k]")} AS BIGINT))),
       |       (acc, x) -> (acc * 131 + x) % ${Dedup.P})) END""".stripMargin
}
