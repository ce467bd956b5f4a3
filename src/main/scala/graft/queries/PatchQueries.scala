package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.TableIO
import graft.jobs.DependencyPatch

/**
 * X34 under the DuckDB gate (r17 verdict #1): the dependency-patch
 * planner (`jobs/DependencyPatch.scala`, the declarative rewrite of the
 * reference's `update-dependencies.py:70-190`) exercised over a
 * DETERMINISTIC jar-manifest fixture derived from the `part` table, so
 * the oracle recomputes the same manifest from the same parquet and the
 * driver's hash gate grades the plan, the post-patch manifest, and the
 * integrity-violation reasons — previously the one SURVEY §2 row with no
 * CORRECTNESS entry.
 *
 * Fixture grammar (mirrors the reference's filename pattern
 * `^name(-[^-]+)*-version(-[^-]+)*\.jar$`, `update-dependencies.py:158-178`):
 * family names from a 7-slot wheel (single- and multi-token, including
 * prefix-overlapping `spark-core` vs a `spark` patch for the
 * first-patch-wins path), versions from a 5-slot wheel including the
 * hyphen-carrying `1.0-SNAPSHOT` and `33.0-jre` forms, an optional
 * `-k<n>` middle component and `-tests` arch suffix, a `.txt` non-jar
 * family, and a `--x` malformed-body family that the reference regex
 * (`[^-]+` forbids empty tokens) must reject.
 */
object PatchQueries {

  /** Deterministic installed-jar manifest: one filename per distinct
   * (family, mid, version, suffix, ext) combination of the part-key
   * wheels. DISTINCT so join multiplicities are 1 on both engines. */
  private def installed(s: SparkSession, dir: String): DataFrame = {
    val part = TableIO.read(s, dir, "part")
    val k = col("p_partkey")
    val fam = element_at(
      array(lit("spark-core"), lit("guava"), lit("jackson-databind"),
        lit("scala-library"), lit("cassandra-driver-core"), lit("slf4j-api"),
        lit("netty-handler")),
      (pmod(k, lit(7)) + 1).cast("int"))
    val ver = element_at(
      array(lit("1.0"), lit("2.3.1"), lit("1.0-SNAPSHOT"), lit("33.0-jre"),
        lit("4.17.0")),
      (pmod(k, lit(5)) + 1).cast("int"))
    // `--x` middle: an empty hyphen token the reference regex rejects
    val mid = when(pmod(k, lit(17)) === 3, lit("--x"))
      .otherwise(concat(lit("-k"), pmod(k, lit(40))))
    val suf = when(pmod(k, lit(4)) === 0, lit("-tests")).otherwise(lit(""))
    val ext = when(pmod(k, lit(13)) === 9, lit(".txt")).otherwise(lit(".jar"))
    part.select(concat(fam, mid, lit("-"), ver, suf, ext).as("filename")).distinct()
  }

  /** The patch list (`spark-update-dependencies.json` shape): name,
   * Maven group path, old/new version, file-order index. `spark` (idx 3)
   * deliberately also prefixes every `spark-core` jar — first-patch-wins
   * must claim those for idx 2. `netty` claims `netty-handler` via the
   * multi-token family rule, and its `1.0` old-version also matches
   * inside `1.0-SNAPSHOT` bodies (the reference embeds the escaped
   * version in its regex, so `-1.0-SNAPSHOT.jar` matches `-1\.0(-[^-]+)*`
   * — modeled identically here and in the oracle). `slf4j-api` has no
   * patch: the pass-through family. */
  private def patches(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("guava", "com/google/guava", "33.0-jre", "34.1-jre", 0L),
      ("jackson-databind", "com/fasterxml/jackson/core", "2.3.1", "2.18.2", 1L),
      ("spark-core", "org/apache/spark", "1.0-SNAPSHOT", "1.0.1", 2L),
      ("spark", "org/apache/spark", "1.0-SNAPSHOT", "9.9.9", 3L),
      ("scala-library", "org/scala-lang", "2.3.1", "2.13.16", 4L),
      ("cassandra-driver-core", "com/datastax/oss", "4.17.0", "4.19.0", 5L),
      ("netty", "io/netty", "1.0", "2.0", 6L)
    ).toDF("name", "group", "old_version", "new_version", "patch_idx")
  }

  /** DuckDB mirror of [[installed]] + [[patches]] + [[DependencyPatch.plan]]
   * as a reusable CTE chain ending in `pl`. The body expression guards
   * its substring length with greatest(..., 0) — DuckDB errors on a
   * negative length where Spark returns '' (conjuncts are not
   * short-circuited, so a too-short filename would otherwise kill the
   * whole oracle). */
  private val planCtes: String = {
    val body = "substr(i.filename, length(p.name) + 2, " +
      "greatest(length(i.filename) - length(p.name) - 5, 0))"
    s"""inst AS (
       |  SELECT DISTINCT
       |    (['spark-core','guava','jackson-databind','scala-library',
       |      'cassandra-driver-core','slf4j-api','netty-handler'])[CAST(p_partkey % 7 AS INTEGER) + 1] ||
       |    CASE WHEN p_partkey % 17 = 3 THEN '--x' ELSE '-k' || CAST(p_partkey % 40 AS VARCHAR) END ||
       |    '-' ||
       |    (['1.0','2.3.1','1.0-SNAPSHOT','33.0-jre','4.17.0'])[CAST(p_partkey % 5 AS INTEGER) + 1] ||
       |    CASE WHEN p_partkey % 4 = 0 THEN '-tests' ELSE '' END ||
       |    CASE WHEN p_partkey % 13 = 9 THEN '.txt' ELSE '.jar' END AS filename
       |  FROM part),
       |pat AS (
       |  SELECT * FROM (VALUES
       |    ('guava', 'com/google/guava', '33.0-jre', '34.1-jre', CAST(0 AS BIGINT)),
       |    ('jackson-databind', 'com/fasterxml/jackson/core', '2.3.1', '2.18.2', CAST(1 AS BIGINT)),
       |    ('spark-core', 'org/apache/spark', '1.0-SNAPSHOT', '1.0.1', CAST(2 AS BIGINT)),
       |    ('spark', 'org/apache/spark', '1.0-SNAPSHOT', '9.9.9', CAST(3 AS BIGINT)),
       |    ('scala-library', 'org/scala-lang', '2.3.1', '2.13.16', CAST(4 AS BIGINT)),
       |    ('cassandra-driver-core', 'com/datastax/oss', '4.17.0', '4.19.0', CAST(5 AS BIGINT)),
       |    ('netty', 'io/netty', '1.0', '2.0', CAST(6 AS BIGINT))
       |  ) t(name, "group", old_version, new_version, patch_idx)),
       |m AS (
       |  SELECT i.filename, p.name, p."group", p.old_version, p.new_version, p.patch_idx,
       |         row_number() OVER (PARTITION BY i.filename ORDER BY p.patch_idx) AS rk
       |  FROM inst i JOIN pat p
       |    ON ends_with(i.filename, '.jar')
       |   AND starts_with(i.filename, p.name || '-')
       |   AND NOT contains('-' || $body, '--')
       |   AND NOT ends_with('-' || $body, '-')
       |   AND (contains('-' || $body, '-' || p.old_version || '-')
       |        OR ends_with('-' || $body, '-' || p.old_version))),
       |mw AS (
       |  SELECT filename, name, "group", old_version, new_version, patch_idx,
       |         replace(filename, old_version, new_version) AS new_filename
       |  FROM m WHERE rk = 1),
       |pl AS (
       |  SELECT filename, name, "group", old_version, new_version, patch_idx,
       |         new_filename,
       |         split_part(new_filename, '-' || new_version, 1) AS lib_name,
       |         'https://repo1.maven.org/maven2/' || "group" || '/' ||
       |           split_part(new_filename, '-' || new_version, 1) || '/' ||
       |           new_version || '/' || new_filename AS maven_url
       |  FROM mw)""".stripMargin
  }

  /** Deterministic observed-artifact facts over the plan's expected
   * post-patch jars: a small hash wheel assigns each jar one failure
   * mode (missing / empty / bad zip / no manifest / size mismatch /
   * unknown expected size) or a clean pass, with compound facts on the
   * missing rows pinning the reason-precedence order of
   * `_check_downloaded_file` (`update-dependencies.py:50-68`). */
  private def observedFacts(planned: DataFrame): DataFrame = {
    val f = col("filename")
    val h = pmod(length(f) * 7 + ascii(substring(f, 1, 1)), lit(11))
    planned.select(col("new_filename").as("filename"))
      .withColumn("__h", h)
      .withColumn("exists", col("__h") =!= 0)
      .withColumn("size_bytes",
        when(col("__h").isin(0, 1), lit(0L))
          .otherwise(length(f).cast("long") * 1000))
      .withColumn("is_zip", !col("__h").isin(0, 2))
      .withColumn("has_manifest", !col("__h").isin(0, 3))
      .withColumn("expected_size",
        when(col("__h") === 4, col("size_bytes") + 1)
          .when(col("__h") === 5, lit(null).cast("long"))
          .otherwise(col("size_bytes")))
      .drop("__h")
  }

  val all: Seq[Q] = Seq(

    // X34(a) — the match+rewrite plan itself: which installed jars each
    // patch claims (first-patch-wins on overlap), the rewritten
    // filename, the Maven artifactId, and the download URL.
    Q("dependency_patch_plan",
      (s, dir) => DependencyPatch.plan(installed(s, dir), patches(s))
        .select("filename", "name", "group", "old_version", "new_version",
          "patch_idx", "new_filename", "lib_name", "maven_url")
        .orderBy("filename"),
      Some(s"""WITH $planCtes
              |SELECT filename, name, "group", old_version, new_version,
              |       patch_idx, new_filename, lib_name, maven_url
              |FROM pl
              |ORDER BY filename""".stripMargin)),

    // X34(b) — the post-patch directory manifest: matched jars carry
    // their new filename, everything else (unmatched jars, non-jar
    // files, the malformed `--x` family) passes through untouched.
    Q("dependency_patch_manifest",
      (s, dir) => DependencyPatch.applyPlan(installed(s, dir), patches(s))
        .orderBy("filename", "patched"),
      Some(s"""WITH $planCtes
              |SELECT coalesce(pl.new_filename, i.filename) AS filename,
              |       pl.new_filename IS NOT NULL AS patched
              |FROM inst i LEFT JOIN pl ON i.filename = pl.filename
              |ORDER BY filename, patched""".stripMargin)),

    // X34(c) — the re-verify gate: violations only, with `reason` in
    // exactly the reference's check order (missing before empty before
    // bad_zip before no_manifest before size_mismatch — the compound
    // facts on missing rows prove the precedence, not just the tests).
    Q("dependency_patch_violations",
      (s, dir) => DependencyPatch.verifyIntegrity(
          observedFacts(DependencyPatch.plan(installed(s, dir), patches(s))))
        .select("filename", "size_bytes", "reason")
        .orderBy("filename"),
      Some(s"""WITH $planCtes,
              |obs AS (
              |  SELECT new_filename AS filename,
              |         (length(new_filename) * 7 + ascii(substr(new_filename, 1, 1))) % 11 AS h
              |  FROM pl),
              |facts AS (
              |  SELECT filename,
              |         h <> 0 AS "exists",
              |         CASE WHEN h IN (0, 1) THEN CAST(0 AS BIGINT)
              |              ELSE length(filename) * 1000 END AS size_bytes,
              |         h NOT IN (0, 2) AS is_zip,
              |         h NOT IN (0, 3) AS has_manifest,
              |         CASE WHEN h = 4 THEN length(filename) * 1000 + 1
              |              WHEN h = 5 THEN CAST(NULL AS BIGINT)
              |              WHEN h IN (0, 1) THEN CAST(0 AS BIGINT)
              |              ELSE length(filename) * 1000 END AS expected_size
              |  FROM obs),
              |graded AS (
              |  SELECT filename, size_bytes,
              |    CASE WHEN NOT "exists" THEN 'missing'
              |         WHEN size_bytes = 0 THEN 'empty'
              |         WHEN NOT is_zip THEN 'bad_zip'
              |         WHEN NOT has_manifest THEN 'no_manifest'
              |         WHEN expected_size IS NOT NULL AND size_bytes <> expected_size
              |           THEN 'size_mismatch' END AS reason
              |  FROM facts)
              |SELECT filename, size_bytes, reason
              |FROM graded
              |WHERE reason IS NOT NULL
              |ORDER BY filename""".stripMargin))
  )
}
