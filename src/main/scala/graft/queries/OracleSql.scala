package graft.queries

import graft.ext.Dedup

/**
 * Shared DuckDB mirrors of the engine's portable hash expressions. One
 * definition per formula: the Spark side lives in TextOps/Dedup, the
 * DuckDB side here — changing a formula means touching exactly one Scala
 * expression and one SQL mirror, never per-query copies.
 */
object OracleSql {

  /** Mirror of TextOps.tokenHashSql: base-131 polynomial over the first
   * 8 chars + last-char and length terms, mod Dedup.P. Alignment pins
   * (verified directly against DuckDB): out-of-range substring yields ''
   * and ascii('') = 0 in both engines; negative substring positions
   * count from the end in both; length() (characters), NOT strlen()
   * (bytes) — the two diverge on any multibyte token, which would
   * silently break every shingle/minhash/simhash/fingerprint oracle on
   * the first non-ASCII corpus. */
  def tokenHash(t: String): String = {
    val pows = Seq.iterate(1L, 8)(_ * 131L)
    val terms = pows.zipWithIndex
      .map { case (p, i) => s"CAST(ascii(substring($t,${i + 1},1)) AS BIGINT)*$p" }
    s"((${terms.mkString(" + ")} + CAST(ascii(substring($t,-1,1)) AS BIGINT)*1000003" +
      s" + CAST(length($t) AS BIGINT)*7) % ${Dedup.P})"
  }

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

  /** Mirror of Dedup.withBandKeys band `j`: the band's r raw minhash
   * components packed c0·P + c1 (null for short docs), coalesced to the
   * per-doc sentinel. References columns `doc_id` and `text` of the
   * enclosing FROM. */
  def bandKey(j: Int): String = {
    def rawSig(a: Long, b: Long) =
      s"list_min(list_transform($shingles, s -> (s * $a + $b) % ${Dedup.P}))"
    val packed = (0 until Dedup.LshRowsPerBand)
      .map { r => val (a, b) = Dedup.BandedSeeds(j * Dedup.LshRowsPerBand + r); rawSig(a, b) }
      .reduce((acc, c) => s"(($acc) * ${Dedup.P} + $c)")
    s"coalesce($packed, -(doc_id & ${Dedup.SentinelMask}) - 2)"
  }

  /** Force DuckDB to MATERIALIZE every CTE of an oracle query (a pure
   * performance hint — results are unchanged). DuckDB inlines
   * non-materialized CTEs once per reference, so a CTE chain whose
   * stages each hold 60+ `list_reduce` plane dots (the banded-kNN
   * mirrors) or a per-bit lambda over the shingle expression (simhash)
   * re-evaluates the whole upstream expression tree at every reference
   * — the round-15 gate died on exactly this (`knn_communities` 343 s →
   * 3 s with materialization). Recursive CTE heads cannot be
   * materialized; pass them in `recursive`. Named `WINDOW w AS (...)`
   * clauses are excluded by the lookbehind. */
  def mat(sql: String, recursive: Set[String] = Set("reach")): String =
    """(?<!WINDOW )\b(\w+) AS \(""".r.replaceAllIn(sql, m =>
      if (recursive(m.group(1))) m.matched
      else java.util.regex.Matcher.quoteReplacement(
        s"${m.group(1)} AS MATERIALIZED ("))

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
