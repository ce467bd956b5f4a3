package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Dependency-patch planner — the rewrite half of the reference's jar
 * patcher (`/root/reference/update-dependencies.py:70-190`), re-expressed
 * as a pure plan over a jar-manifest table. The integrity-check half
 * (`update-dependencies.py:50-68`) is modeled by `tools/jar_check.py` and
 * [[verifyIntegrity]] below.
 *
 * The reference walks an image's dependency directory once, matches each
 * patch entry `{name, group, old_version, new_version}` against jar
 * filenames of the form `<family>(-<component>)*-<version>(-<arch>)*.jar`,
 * downloads the new-version jar from Maven Central, verifies it (exists,
 * non-empty, valid zip, has META-INF/MANIFEST.MF), copies it in place,
 * verifies the copy by size equality, and deletes the old jar. In the
 * zero-egress harness the download itself is out of scope — what IS
 * modeled, declaratively, is everything the reference computes:
 * which files match, the replacement filename, the Maven coordinates/URL,
 * the post-patch manifest, and the re-verify gate over observed artifact
 * facts.
 *
 * Everything here is narrow builtin-column arithmetic — no UDFs, no
 * collect — so a 10⁶-row manifest (a fleet-wide jar inventory, not one
 * image) plans exactly like ten rows.
 */
object DependencyPatch {


  /**
   * Match + rewrite plan: one row per (installed jar, patch) pair that the
   * reference's filename pattern accepts
   * (`update-dependencies.py:158-178`): the filename starts with the
   * dependency family name and `old_version` appears after it delimited
   * by hyphens (hyphen-carrying versions like `1.0-SNAPSHOT` included —
   * the reference embeds the escaped version literally in its regex).
   *
   * Output columns: `filename`, patch identity (`name`, `group`,
   * `old_version`, `new_version`), `new_filename` (every occurrence of
   * the old version replaced — Python `str.replace` semantics,
   * `update-dependencies.py:43`), `lib_name` (the Maven artifactId: the
   * prefix before the first `-<new_version>`, `update-dependencies.py:45-47`)
   * and `maven_url` (`update-dependencies.py:73-75`).
   *
   * A file matched by several patch entries is claimed by the FIRST
   * (lowest `patch_idx`) — the reference applies patches sequentially
   * against a directory listing taken once, so the first writer wins and
   * later matches operate on a filename that no longer exists.
   */
  def plan(installed: DataFrame, patches: DataFrame): DataFrame = {
    // The reference applies its patch LIST in file order; a DataFrame has
    // no implicit order, so the caller passes `patch_idx` to carry it.
    // Without one, a canonical sorted order stands in — deterministic
    // either way. The global row_number window is fine here: patches are
    // a config artifact (tens of rows), never data-scale.
    val indexed =
      if (patches.columns.contains("patch_idx")) patches
      else patches.withColumn("patch_idx",
        row_number().over(Window.orderBy("name", "old_version", "new_version")) - 1)
    // The reference's pattern `^name(?:-[^-]+)*-version(?:-[^-]+)*\.jar$`
    // embeds the ESCAPED version literally, so a hyphenated version
    // (1.0-SNAPSHOT, 2.0-M1, 33.0-jre) spans several hyphen tokens — a
    // split-on-hyphen token test can never match it. Equivalent
    // string-boundary form, hyphenated versions included: the body after
    // the family-name prefix (`.jar` stripped) must be a well-formed
    // `-token` run (leading hyphen, NO empty tokens — `[^-]+` forbids
    // `--` — and no trailing hyphen) containing `-version` delimited by
    // a hyphen or the end. The hyphen delimiters ARE the token
    // boundaries, so no per-row regex compile is needed; equivalence to
    // the reference regex is pinned exhaustively in DependencyPatchSpec.
    val body = expr("substring(filename, length(name) + 1, length(filename) - length(name) - 4)")
    // patches are a config artifact (tens of rows) — broadcast EXPLICITLY
    // so the non-equi match keeps its BroadcastNestedLoopJoin shape even
    // when the planner grants no implicit broadcast (the PLAN_AB
    // no-broadcast axis: threshold=-1 degraded this to a CartesianProduct,
    // which at a 10⁶-row fleet manifest would shuffle the manifest)
    val matched = installed
      .join(broadcast(indexed),
        col("filename").endsWith(".jar") &&
          col("filename").startsWith(concat(col("name"), lit("-"))) &&
          !body.contains("--") && !body.endsWith("-") &&
          (body.contains(concat(lit("-"), col("old_version"), lit("-"))) ||
           body.endsWith(concat(lit("-"), col("old_version")))),
        "inner")
    // first-patch-wins per filename (deterministic: patch_idx order)
    val w = Window.partitionBy("filename").orderBy("patch_idx")
    matched
      .withColumn("__rk", row_number().over(w)).filter(col("__rk") === 1).drop("__rk")
      .withColumn("new_filename", replace(col("filename"), col("old_version"), col("new_version")))
      .withColumn("lib_name", expr("substring_index(new_filename, '-' || new_version, 1)"))
      .withColumn("maven_url",
        concat(lit("https://repo1.maven.org/maven2/"), col("group"), lit("/"),
          col("lib_name"), lit("/"), col("new_version"), lit("/"), col("new_filename")))
  }

  /**
   * Post-patch manifest: the directory listing after every planned
   * replacement lands — matched jars carry their new filename, unmatched
   * files pass through untouched, and the old filenames are gone (the
   * reference deletes them via its file bin on context exit,
   * `update-dependencies.py:91-99,104`). `patched` marks rewritten rows.
   */
  def applyPlan(installed: DataFrame, patches: DataFrame): DataFrame = {
    val p = plan(installed, patches).select("filename", "new_filename")
    installed.join(p, Seq("filename"), "left_outer")
      .select(
        coalesce(col("new_filename"), col("filename")).as("filename"),
        col("new_filename").isNotNull.as("patched"))
  }

  /**
   * Re-verify gate over observed artifact facts — the declarative face of
   * `_check_downloaded_file` (`update-dependencies.py:50-68`) plus the
   * copy size-equality check (`update-dependencies.py:108-116`). Input:
   * one row per expected post-patch jar with what a scanner observed
   * (`exists`, `size_bytes`, `is_zip`, `has_manifest`, and
   * `expected_size` from the staged download). Output: violations only,
   * with `reason` ordered exactly like the reference's checks — a missing
   * file reports as missing, not also as 0-byte/bad-zip.
   */
  def verifyIntegrity(observed: DataFrame): DataFrame =
    observed.withColumn("reason",
      when(not(col("exists")), lit("missing"))
        .when(col("size_bytes") === 0, lit("empty"))
        .when(not(col("is_zip")), lit("bad_zip"))
        .when(not(col("has_manifest")), lit("no_manifest"))
        .when(col("expected_size").isNotNull && col("size_bytes") =!= col("expected_size"),
          lit("size_mismatch")))
      .filter(col("reason").isNotNull)
}
