package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.config.CdmConfig
import graft.jobs.Migrate
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 * Queries live in graft.queries.*; each exercises the real operator code
 * and carries its DuckDB oracle SQL when ANSI-expressible. */
object SparkEntry {

  /** Everything registered, in build order (SURVEY.md §7.3). */
  def registry: Seq[Q] = {
    val all = CoreQueries.all ++ TransformQueries.all ++ DiffQueries.all ++
      WindowQueries.all ++ TemporalQueries.all ++ TextQueries.all ++
      CurationQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ AnalyticsQueries.all ++
      PipelineQueries.all ++ PatchQueries.all
    // a duplicated name would silently shadow its twin in the maps below
    val dups = all.groupBy(_.name).collect { case (n, qs) if qs.sizeIs > 1 => n }
    require(dups.isEmpty, s"duplicate query names registered: ${dups.mkString(", ")}")
    all
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
   * J1 Migrate lineage: scan → rename → pushed filter (SURVEY.md §3.1). */
  def entry(spark: SparkSession): DataFrame =
    Migrate.plan(spark, CdmConfig.fromMap(Map(
      "spark.cdm.connect.origin.path" -> "/root/testdata/sf0.001",
      "spark.cdm.schema.origin.keyspaceTable" -> "lineitem",
      "spark.cdm.schema.origin.primaryKey" -> "l_orderkey,l_linenumber",
      "spark.cdm.schema.origin.column.names.to.target" -> "l_orderkey:order_id",
      "spark.cdm.filter.cassandra.whereCondition" -> "l_quantity > 10"
    )))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** Optional per-query STAGING hooks (r17 verdict #5): build persisted
   * state (StateStore ledgers, backfill history) outside any timed
   * region. graft.Bench runs a query's hook once before its samples so
   * min-of-N measures the operator, not one-time construction; Verify
   * does not need them (first execution builds lazily and correctness is
   * unchanged). */
  def prepares: Map[String, (SparkSession, String) => Unit] =
    SimilarityQueries.prepares ++ PipelineQueries.prepares

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * Every CTE is marked MATERIALIZED (OracleSql.mat): DuckDB otherwise
    * re-inlines a CTE per reference, which made the round-15 sf0.01
    * correctness gate time out on the banded-kNN mirrors
    * (`knn_communities`' oracle: 343 s → 3 s at sf0.001). A pure DuckDB
    * performance hint — the hash-compared results are unchanged. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> OracleSql.mat(sql))).toMap
}
