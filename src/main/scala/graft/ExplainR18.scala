package graft

import org.apache.spark.sql.SparkSession

/** Round-19 optimization evidence tool (r18 tool, retargeted): dump `.explain("formatted")` for a
 * named set of queries under the BENCH configuration (local[$SPARK_GRAFT_CPUS],
 * shuffle.partitions = cpus, AQE on — the conf whose plans the round's
 * before/after claims are about, unlike PlanDump's local[4] headliner set).
 *
 * Usage: runMain graft.ExplainR18 <suffix> <q1,q2,...>
 * Writes plans/r19/<query>_<suffix>.txt per query. */
object ExplainR18 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainR18 <suffix> <q1,q2,...>")
    val suffix = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
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
    val dir = java.nio.file.Paths.get("plans/r19")
    java.nio.file.Files.createDirectories(dir)
    // a suffix ending in "_exec" EXECUTES each query through the noop
    // sink first and dumps the AQE-FINAL executed plan — the only place
    // runtime join-strategy rewrites (SMJ → shuffled-hash under
    // preferSortMergeJoin=false with accurate runtime sizes) are visible
    val exec = suffix.endsWith("_exec")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (exec) df.write.mode("overwrite").format("noop").save()
      val plan =
        if (exec) df.queryExecution.executedPlan.toString
        else df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(dir.resolve(s"${name}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[explain] wrote plans/r19/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
