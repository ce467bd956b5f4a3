package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query on
 * SPARK_GRAFT_SF_DIR, one JSON line to stdout.
 *
 * Each query is materialized through the noop DSv2 sink — unlike
 * `count()`, which lets Catalyst prune the plan to row counting, noop
 * executes the full projection/serialization path, so the timing reflects
 * real operator cost. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.registry.map(_.name)
    // one warm-up of the first query amortizes JVM/codegen startup
    names.headOption.foreach(runOnce)
    // two timed runs per query, keep the min: reports steady-state
    // operator cost instead of first-run codegen/JIT noise. A query that
    // failed EITHER run reports -1 — a flaky failure must be visible in
    // the output, not masked by its one good run.
    val results = names.map { n =>
      val t1 = runOnce(n); val t2 = runOnce(n)
      n -> (if (t1 < 0 || t2 < 0) -1.0 else math.min(t1, t2))
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failed = results.filter(_._2 < 0).map(_._1)
    val total = results.map(_._2).filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
