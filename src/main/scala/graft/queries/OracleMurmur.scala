package graft.queries

/**
 * Cassandra Murmur3Partitioner ring tokens in PURE DuckDB SQL — the
 * oracle half that graduates `cassandra_token_ranges`/`_text` from
 * rows-only (r17 verdict: "DuckDB cannot evaluate Cassandra's murmur3").
 * It can: 64-bit wrap arithmetic lives in the UNSIGNED HUGEINT domain
 * [0, 2⁶⁴), with multiplies split 32/32 so no intermediate exceeds
 * HUGEINT's 127-bit range, xor through UBIGINT casts, and rotations as
 * shift-sum over disjoint bit ranges. This is a THIRD independent
 * implementation of the ring (after the engine kernel and the
 * Guava-pinned spec reference), so a hash match is cross-implementation
 * evidence, not self-agreement.
 *
 * Structured as a chain of CTEs (one hash stage per CTE) because DuckDB
 * inlines lateral aliases per REFERENCE — a single-SELECT formulation
 * re-expands the whole block fold at every downstream use (~MBs of
 * expression tree). The block fold itself runs inside one list_reduce
 * whose accumulator is a LIST [h1, h2]: a struct_pack accumulator
 * mis-evaluates in DuckDB 1.0 when a later field references an earlier
 * acc field (sequential rebinding, inconsistently across steps —
 * verified empirically); list construction has no rebinding, and the
 * h2 update re-derives the new h1 textually.
 *
 * Byte-level inputs come from ascii()/substring — correct for the ASCII
 * fixture corpus (same caveat as every text oracle here; a multi-byte
 * corpus would need BLOB byte extraction on both engines).
 */
object OracleMurmur {

  private val H = BigInt(1) << 64
  private val M32 = BigInt(1) << 32
  private def u64(x: BigInt): BigInt = x & (H - 1)

  private val C1 = u64(BigInt("87c37b91114253d5", 16))
  private val C2 = u64(BigInt("4cf5ad432745937f", 16))

  /** a · c mod 2⁶⁴ for CONSTANT c, 32/32 split (3 references to `a`). */
  private def mulc(a: String, c: BigInt): String = {
    val cl = c % M32
    val ch = c / M32
    s"(((($a) % 4294967296) * $cl + (((($a) // 4294967296) * $cl + " +
      s"(($a) % 4294967296) * $ch) % 4294967296) * 4294967296) % $H)"
  }
  private def addv(a: String, b: String): String = s"((($a) + ($b)) % $H)"
  private def xorv(a: String, b: String): String =
    s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)"
  private def rotl(v: String, n: Int): String =
    s"(((($v) * ${BigInt(1) << n}) % $H + (($v) // ${BigInt(1) << (64 - n)})) % $H)"
  private def shr(v: String, n: Int): String = s"(($v) // ${BigInt(1) << n})"

  /** Little-endian masked 8-byte block read from the byte list `__b`. */
  private def blockRead(baseOff: String, half: Int): String =
    (0 until 8).map(j =>
      s"CAST(__b[($baseOff) + ${half + j + 1}] AS HUGEINT) * ${BigInt(1) << (8 * j)}")
      .mkString("(", " + ", ")")

  private def premixK1(raw: String): String = mulc(rotl(mulc(raw, C1), 31), C2)
  private def premixK2(raw: String): String = mulc(rotl(mulc(raw, C2), 33), C1)

  /** Cassandra's tail quirk: tail bytes promote with SIGN extension. */
  private def signedByte(e: String): String =
    s"(CASE WHEN ($e) >= 128 THEN ($e) + ${H - 256} ELSE ($e) END)"

  /**
   * CTE chain `<p>0 .. <p>8` computing `outName` (the signed BIGINT ring
   * token, MIN_VALUE normalized to MAX_VALUE) from `bytesExpr` — a
   * DuckDB expression over `srcCte`'s columns yielding LIST<HUGEINT> of
   * byte values 0..255. `carry` columns pass through every stage.
   */
  def murmurCtes(p: String, srcCte: String, bytesExpr: String,
      carry: Seq[String], outName: String): String = {
    val cc = carry.mkString(", ")
    val blocks =
      s"list_transform(range(0, CAST(__n // 16 AS BIGINT)), b -> [" +
        s"${premixK1(blockRead("b * 16", 0))}, ${premixK2(blockRead("b * 16", 8))}])"
    val h1u = addv(mulc(addv(rotl(xorv("acc[1]", "x[1]"), 27), "acc[2]"), 5), BigInt(0x52dce729L).toString)
    val h2u = addv(mulc(addv(rotl(xorv("acc[2]", "x[2]"), 31), h1u), 5), BigInt(0x38495ab5L).toString)
    val fold = s"list_reduce(list_prepend([CAST(0 AS HUGEINT), CAST(0 AS HUGEINT)], " +
      s"$blocks), (acc, x) -> [$h1u, $h2u])"
    def xfold(lst: String) =
      s"list_reduce(list_prepend(CAST(0 AS HUGEINT), $lst), (a, x) -> ${xorv("a", "x")})"
    val tailByte = signedByte("CAST(__b[CAST(__t AS BIGINT) + j + 1] AS HUGEINT)")
    val k2t = xfold(s"list_transform(range(8, CAST(__rem AS BIGINT)), j -> " +
      s"($tailByte * CAST(power(2, 8 * (j - 8)) AS HUGEINT)) % $H)")
    val k1t = xfold(s"list_transform(range(0, CAST(least(__rem, 8) AS BIGINT)), j -> " +
      s"($tailByte * CAST(power(2, 8 * j) AS HUGEINT)) % $H)")
    s"""${p}0 AS (
       |  SELECT $cc, $bytesExpr AS __b, CAST(len($bytesExpr) AS HUGEINT) AS __n
       |  FROM $srcCte),
       |${p}1 AS (
       |  SELECT $cc, __b, __n,
       |         CAST((__n // 16) * 16 AS HUGEINT) AS __t,
       |         CAST(__n % 16 AS HUGEINT) AS __rem,
       |         $fold AS __st
       |  FROM ${p}0),
       |${p}2 AS (
       |  SELECT $cc, __n,
       |         CASE WHEN __rem > 0 THEN ${xorv("__st[1]", premixK1(k1t))} ELSE __st[1] END AS __h1a,
       |         CASE WHEN __rem > 8 THEN ${xorv("__st[2]", premixK2(k2t))} ELSE __st[2] END AS __h2a
       |  FROM ${p}1),
       |${p}3 AS (
       |  SELECT $cc, ${xorv("__h1a", "__n")} AS __h1b, ${xorv("__h2a", "__n")} AS __h2b
       |  FROM ${p}2),
       |${p}4 AS (
       |  SELECT $cc, ${addv("__h1b", "__h2b")} AS __h1c,
       |         ${addv("__h2b", addv("__h1b", "__h2b"))} AS __h2c
       |  FROM ${p}3),
       |${p}5 AS (
       |  SELECT $cc,
       |         ${mulc(xorv("__h1c", shr("__h1c", 33)), u64(BigInt("ff51afd7ed558ccd", 16)))} AS __f1a,
       |         ${mulc(xorv("__h2c", shr("__h2c", 33)), u64(BigInt("ff51afd7ed558ccd", 16)))} AS __f2a
       |  FROM ${p}4),
       |${p}6 AS (
       |  SELECT $cc,
       |         ${mulc(xorv("__f1a", shr("__f1a", 33)), u64(BigInt("c4ceb9fe1a85ec53", 16)))} AS __f1b,
       |         ${mulc(xorv("__f2a", shr("__f2a", 33)), u64(BigInt("c4ceb9fe1a85ec53", 16)))} AS __f2b
       |  FROM ${p}5),
       |${p}7 AS (
       |  SELECT $cc, ${addv(xorv("__f1b", shr("__f1b", 33)), xorv("__f2b", shr("__f2b", 33)))} AS __tok_u
       |  FROM ${p}6),
       |${p}8 AS (
       |  SELECT $cc,
       |         CASE WHEN __tok_u = ${H / 2} THEN CAST(${H / 2 - 1} AS BIGINT)
       |              WHEN __tok_u >= ${H / 2} THEN CAST(__tok_u - $H AS BIGINT)
       |              ELSE CAST(__tok_u AS BIGINT) END AS $outName
       |  FROM ${p}7)""".stripMargin
  }

  /** CQL bigint serialization: 8 bytes big-endian, as LIST<HUGEINT>. */
  def bigintBytes(col: String): String =
    s"list_transform(range(0, 8), j -> ((CASE WHEN $col < 0 THEN CAST($col AS HUGEINT) + $H " +
      s"ELSE CAST($col AS HUGEINT) END) // CAST(power(2, 56 - 8 * j) AS HUGEINT)) % 256)"

  /** UTF-8 text bytes (ASCII fixture corpus), as LIST<HUGEINT>. */
  def textBytes(col: String): String =
    s"list_transform(range(1, CAST(strlen($col) + 1 AS BIGINT)), " +
      s"i -> CAST(ascii(substring($col, CAST(i AS INTEGER), 1)) AS HUGEINT))"

  /** CompositeType serialization of (bigint, text): per component a
   * 2-byte big-endian length, the bytes, and the 0x00 end marker. */
  def compositeBigintText(keyCol: String, textCol: String): String =
    s"list_concat(list_concat(list_concat(list_concat(" +
      s"[CAST(0 AS HUGEINT), CAST(8 AS HUGEINT)], ${bigintBytes(keyCol)}), " +
      s"[CAST(0 AS HUGEINT), CAST(strlen($textCol) // 256 AS HUGEINT), " +
      s"CAST(strlen($textCol) % 256 AS HUGEINT)]), ${textBytes(textCol)}), " +
      s"[CAST(0 AS HUGEINT)])"

  /** Arithmetic (sign-extending) right shift by 62 plus 2 — Spark's
   * `shiftright(token, 62) + 2` range-id, via the unsigned domain
   * (DuckDB's integer ops truncate toward zero, so a plain `//` on a
   * negative token would disagree near zero). */
  def rangeId(tok: String): String =
    s"(((CASE WHEN $tok < 0 THEN CAST($tok AS HUGEINT) + $H ELSE CAST($tok AS HUGEINT) END) " +
      s"// ${BigInt(1) << 62} + 2) % 4)"
}
