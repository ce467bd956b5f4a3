package graft.jobs

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Feeds a synthetic jar manifest through the patch plan and the
 * jar_check-style integrity gate — the rewrite engine the reference's
 * dependency patcher runs against a container image's jar directory
 * (reference update-dependencies.py; examples below are the ones its own
 * filename-pattern comment documents). */
class DependencyPatchSpec extends SparkSpec {
  import spark.implicits._

  private val installed = Seq(
    "netty-all-4.2.6.Final.jar",
    "netty-codec-native-quic-4.2.6.Final-linux-aarch_64.jar",
    "netty-unrelated-1.0.0.jar",      // family matches, version doesn't
    "not-netty-4.2.6.Final.jar",      // version matches, family doesn't
    "log4j-core-2.24.0.jar",
    "README.txt"                      // not a jar at all
  ).toDF("filename")

  private val patches = Seq(
    ("netty", "io/netty", "4.2.6.Final", "4.2.7.Final"),
    ("log4j", "org/apache/logging/log4j", "2.24.0", "2.25.1")
  ).toDF("name", "group", "old_version", "new_version")

  test("plan matches the reference's filename pattern and builds coordinates") {
    val p = DependencyPatch.plan(installed, patches)
      .select("filename", "new_filename", "lib_name", "maven_url")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap

    assert(p.keySet == Set(
      "netty-all-4.2.6.Final.jar",
      "netty-codec-native-quic-4.2.6.Final-linux-aarch_64.jar",
      "log4j-core-2.24.0.jar"))
    assert(p("netty-all-4.2.6.Final.jar") ==
      (("netty-all-4.2.7.Final.jar", "netty-all",
        "https://repo1.maven.org/maven2/io/netty/netty-all/4.2.7.Final/netty-all-4.2.7.Final.jar")))
    // arch-suffixed jar: version token replaced mid-name, artifactId keeps
    // the component tokens, URL filename keeps the arch suffix
    assert(p("netty-codec-native-quic-4.2.6.Final-linux-aarch_64.jar") ==
      (("netty-codec-native-quic-4.2.7.Final-linux-aarch_64.jar", "netty-codec-native-quic",
        "https://repo1.maven.org/maven2/io/netty/netty-codec-native-quic/4.2.7.Final/" +
          "netty-codec-native-quic-4.2.7.Final-linux-aarch_64.jar")))
  }

  test("applyPlan produces the post-patch manifest: old gone, new present, rest untouched") {
    val after = DependencyPatch.applyPlan(installed, patches)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(after == Map(
      "netty-all-4.2.7.Final.jar" -> true,
      "netty-codec-native-quic-4.2.7.Final-linux-aarch_64.jar" -> true,
      "netty-unrelated-1.0.0.jar" -> false,
      "not-netty-4.2.6.Final.jar" -> false,
      "log4j-core-2.25.1.jar" -> true,
      "README.txt" -> false))
  }

  test("first patch wins when two entries match the same jar") {
    val dup = Seq(
      ("netty", "io/netty", "4.2.6.Final", "4.2.7.Final"),
      ("netty", "io/netty", "4.2.6.Final", "9.9.9")
    ).toDF("name", "group", "old_version", "new_version")
    val names = DependencyPatch.plan(installed, dup)
      .filter($"filename" === "netty-all-4.2.6.Final.jar")
      .select("new_filename").as[String].collect().toSeq
    assert(names == Seq("netty-all-4.2.7.Final.jar"))
  }

  test("hyphenated versions match like the reference's escaped-literal regex") {
    val inst = Seq(
      "demo-core-1.0-SNAPSHOT.jar",
      "demo-core-1.0-SNAPSHOT-linux-x86_64.jar",
      "demo-core-11.0-SNAPSHOT.jar" // version boundary: must NOT match 1.0-SNAPSHOT
    ).toDF("filename")
    val p = Seq(("demo", "org/demo", "1.0-SNAPSHOT", "1.1-SNAPSHOT"))
      .toDF("name", "group", "old_version", "new_version")
    val got = DependencyPatch.plan(inst, p)
      .select("filename", "new_filename", "lib_name").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got == Map(
      "demo-core-1.0-SNAPSHOT.jar" ->
        (("demo-core-1.1-SNAPSHOT.jar", "demo-core")),
      "demo-core-1.0-SNAPSHOT-linux-x86_64.jar" ->
        (("demo-core-1.1-SNAPSHOT-linux-x86_64.jar", "demo-core"))), s"got $got")
  }

  test("an explicit patch_idx carries the reference's list order") {
    // reversed priority vs the canonical sort: idx 0 is the 9.9.9 entry
    val dup = Seq(
      ("netty", "io/netty", "4.2.6.Final", "9.9.9", 0),
      ("netty", "io/netty", "4.2.6.Final", "4.2.7.Final", 1)
    ).toDF("name", "group", "old_version", "new_version", "patch_idx")
    val names = DependencyPatch.plan(installed, dup)
      .filter($"filename" === "netty-all-4.2.6.Final.jar")
      .select("new_filename").as[String].collect().toSeq
    assert(names == Seq("netty-all-9.9.9.jar"))
  }

  test("integrity gate reports the first failing check per jar, in reference order") {
    val observed = Seq(
      // filename, exists, size, is_zip, has_manifest, expected_size
      ("ok.jar", true, 100L, true, true, Some(100L)),
      ("gone.jar", false, 0L, false, false, Some(50L)),       // missing beats empty/bad_zip
      ("zero.jar", true, 0L, false, false, None),             // empty beats bad_zip
      ("corrupt.jar", true, 10L, false, false, None),
      ("stripped.jar", true, 10L, true, false, None),
      ("truncated-copy.jar", true, 90L, true, true, Some(100L))
    ).toDF("filename", "exists", "size_bytes", "is_zip", "has_manifest", "expected_size")
    val v = DependencyPatch.verifyIntegrity(observed)
      .select("filename", "reason").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(v == Map(
      "gone.jar" -> "missing",
      "zero.jar" -> "empty",
      "corrupt.jar" -> "bad_zip",
      "stripped.jar" -> "no_manifest",
      "truncated-copy.jar" -> "size_mismatch"))
  }

  test("match semantics equal the reference regex over the structured filename space") {
    // The reference matches ^<name>(?:-[^-]+)*-<version>(?:-[^-]+)*\.jar$
    // with both literals re.escape()d. Enumerate the cross product of
    // realistic (and adversarial) name/component/version/arch shapes and
    // assert plan()'s string-boundary decomposition selects EXACTLY the
    // filenames the regex does — the hyphenated-version divergence this
    // pins was a real reviewer-caught bug.
    val names = Seq("demo", "netty", "log4j")
    val comps = Seq("", "core", "codec-native-quic")
    val versions = Seq("1.0", "1.0-SNAPSHOT", "4.2.7.Final", "33.0-jre", "11.0")
    val arches = Seq("", "linux-x86_64", "osx-aarch_64")
    val files = (for {
      n <- names; c <- comps; v <- versions; a <- arches
    } yield Seq(n, c, v, a).filter(_.nonEmpty).mkString("-") + ".jar") ++
      Seq("not-a-jar.txt", "demo.jar", "demo--1.0.jar", "xdemo-1.0.jar",
        "demo-1.0", "demo-core-1.0.zip")
    val patches = for (n <- names; v <- versions) yield (n, v)

    val installed = files.distinct.toDF("filename")
    for ((n, v) <- patches) {
      val refPattern =
        ("^" + java.util.regex.Pattern.quote(n) + "(?:-[^-]+)*-" +
          java.util.regex.Pattern.quote(v) + "(?:-[^-]+)*\\.jar$").r
      val expected = files.distinct.filter(f => refPattern.findFirstIn(f).isDefined).toSet
      val got = DependencyPatch.plan(installed,
          Seq((n, "g", v, v + ".new")).toDF("name", "group", "old_version", "new_version"))
        .select("filename").as[String].collect().toSet
      assert(got == expected,
        s"patch ($n, $v): plan=${got.toSeq.sorted} regex=${expected.toSeq.sorted}")
    }
  }

  test("the patch plan stays declarative (no UDF, no cartesian product)") {
    val plan = DependencyPatch.plan(installed, patches).queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"patcher must be builtin-column arithmetic:\n${plan.take(2000)}")
  }
}
