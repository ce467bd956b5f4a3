package graft

import graft.queries.OracleSql
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[OracleSql.mat]]'s structural CTE rewrite (r16 advisor: the old
 * textual `\w+ AS (` regex would corrupt a second named window or any
 * recursive CTE not literally named `reach`). */
class OracleMatSpec extends AnyFunSuite {

  test("plain CTE chain: every head materialized") {
    val in = "WITH a AS (SELECT 1), b AS (SELECT * FROM a) SELECT * FROM b"
    assert(OracleSql.mat(in) ==
      "WITH a AS MATERIALIZED (SELECT 1), b AS MATERIALIZED (SELECT * FROM a) SELECT * FROM b")
  }

  test("recursive head detected by self-reference, not by name") {
    val in = "WITH RECURSIVE walk AS (SELECT 1 AS x UNION ALL SELECT x+1 FROM walk WHERE x < 5), " +
      "base AS (SELECT * FROM walk) SELECT * FROM base"
    val out = OracleSql.mat(in)
    assert(out.contains("WITH RECURSIVE walk AS (SELECT"), out)
    assert(out.contains("base AS MATERIALIZED (SELECT * FROM walk)"), out)
  }

  test("comma-style self-join marks the head recursive (r17 ADVICE)") {
    // a recursive body can read itself through a comma join (`FROM e, r`)
    // — the FROM/JOIN-only form missed it and DuckDB rejects
    // AS MATERIALIZED on a recursive head
    val in = "WITH RECURSIVE r AS (SELECT 1 AS x UNION ALL " +
      "SELECT e.x+1 FROM e, r WHERE r.x < 5), " +
      "base AS (SELECT * FROM r) SELECT * FROM base"
    val out = OracleSql.mat(in)
    assert(out.contains("WITH RECURSIVE r AS (SELECT"), out)
    assert(out.contains("base AS MATERIALIZED (SELECT * FROM r)"), out)
  }

  test("a column alias sharing the CTE's name does not suppress materialization") {
    // the sparse_cosine_pairs shape: tf AS (SELECT ..., count(*) AS tf ...)
    val in = "WITH tf AS (SELECT k, count(*) AS tf FROM t GROUP BY 1) SELECT * FROM tf"
    assert(OracleSql.mat(in) ==
      "WITH tf AS MATERIALIZED (SELECT k, count(*) AS tf FROM t GROUP BY 1) SELECT * FROM tf")
  }

  test("multiple named WINDOW clauses are never rewritten") {
    val in = "SELECT sum(x) OVER w, avg(x) OVER v FROM t " +
      "WINDOW w AS (PARTITION BY k), v AS (PARTITION BY j ORDER BY x)"
    assert(OracleSql.mat(in) == in)
  }

  test("AS ( inside a string literal is untouched") {
    val in = "WITH a AS (SELECT 'b AS (' AS s) SELECT * FROM a"
    assert(OracleSql.mat(in) == "WITH a AS MATERIALIZED (SELECT 'b AS (' AS s) SELECT * FROM a")
  }

  test("CTE with a column list is materialized after AS") {
    val in = "WITH a(x, y) AS (SELECT 1, 2) SELECT * FROM a"
    assert(OracleSql.mat(in) == "WITH a(x, y) AS MATERIALIZED (SELECT 1, 2) SELECT * FROM a")
  }

  test("subquery aliases and CAST(x AS t) are untouched") {
    val in = "SELECT CAST(x AS BIGINT) FROM (SELECT 1 AS x) q WHERE x IN (SELECT 1)"
    assert(OracleSql.mat(in) == in)
  }

  test("nested WITH inside a CTE body is also materialized") {
    val in = "WITH a AS (WITH inner_q AS (SELECT 1) SELECT * FROM inner_q) SELECT * FROM a"
    val out = OracleSql.mat(in)
    assert(out.contains("a AS MATERIALIZED (WITH inner_q AS MATERIALIZED (SELECT 1)"), out)
  }

  test("every registered oracle: rewrite is insert-only and matches the legacy behavior") {
    // the legacy textual rewrite all 183 driver-green oracles ran under —
    // equality on the CURRENT registry pins zero drift from the
    // structural rewrite (new oracles get the structural guarantees)
    // recursive heads by name: `reach` (the r16-era X22 oracle) and
    // `cuts` (the r18 chunk_cdc_clamped recurrence) — the legacy mirror
    // needs the explicit list precisely because it is textual; mat()
    // detects them structurally
    def legacy(sql: String): String =
      """(?<!WINDOW )\b(\w+) AS \(""".r.replaceAllIn(sql, m =>
        if (m.group(1) == "reach" || m.group(1) == "cuts") m.matched
        else java.util.regex.Matcher.quoteReplacement(s"${m.group(1)} AS MATERIALIZED ("))
    val oracles = SparkEntry.registry.flatMap(q => q.oracle.map(q.name -> _))
    assert(oracles.nonEmpty)
    oracles.foreach { case (name, sql) =>
      val out = OracleSql.mat(sql)
      assert(out.replace(" MATERIALIZED", "") == sql.replace(" MATERIALIZED", ""),
        s"$name: mat() must be insert-only")
      assert(out == legacy(sql), s"$name: structural rewrite diverged from the r16-green legacy form")
      if (sql.toUpperCase.startsWith("WITH") && !sql.toUpperCase.startsWith("WITH RECURSIVE"))
        assert(out.contains("MATERIALIZED"), s"$name: WITH query lost its materialization hint")
    }
  }
}
