package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.CdmConfig
import graft.io.{CassandraTableIO, TableIO}
import graft.ops.Upsert
import graft.run.TrackedMigrate

/**
 * The wrapper's job dispatch, modeled exactly
 * (`/root/reference/entrypoint.sh:228-242`, re-dispatched identically by
 * `/root/reference/spark-submit-cdm:10-26`): the case-INSENSITIVE job name
 * maps `migrate` → Migrate, `validate|diffdata` → DiffData,
 * `guardrail|guardrailcheck` → GuardrailCheck, and anything else is a hard
 * error with the reference's message shape. These three are the only entry
 * points (SURVEY §2.1).
 */
object JobDispatch {

  val Migrate = "Migrate"
  val DiffData = "DiffData"
  val GuardrailCheck = "GuardrailCheck"

  /** `CDM_JOB_NAME` → canonical job class name (entrypoint.sh:230-242). */
  def resolve(jobName: String): String = jobName.toLowerCase match {
    case "migrate" => Migrate
    case "validate" | "diffdata" => DiffData
    case "guardrail" | "guardrailcheck" => GuardrailCheck
    case other => throw new IllegalArgumentException(
      s"Unrecognised job name '$other'. Valid job names are: 'migrate', 'validate', or 'guardrail'.")
  }

  /** Run the named job end-to-end against the configured clusters.
   * Returns the job's report frame (written rows / diff report / guardrail
   * violations) for callers that want to inspect it. */
  def run(spark: SparkSession, jobName: String, cfg: CdmConfig, runId: String = "run-1"): DataFrame =
    resolve(jobName) match {
      case Migrate =>
        if (cfg.trackRun.enabled) TrackedMigrate.run(spark, cfg, runId)
        else graft.jobs.Migrate.run(spark, cfg)
        TableIO.read(spark, cfg.target, cfg.schema.targetTable.getOrElse(cfg.schema.table), Some(cfg.perf))

      case DiffData =>
        val table = cfg.schema.table
        val targetTable = cfg.schema.targetTable.getOrElse(table)
        val liveTarget = cfg.target.host.nonEmpty || cfg.target.scb.nonEmpty
        val origin = TableIO.read(spark, cfg.origin, table, Some(cfg.perf))
        val target = TableIO.read(spark, cfg.target, targetTable, Some(cfg.perf))
        // Parquet target: persist the report FIRST (upstream logs every
        // diff row) so downstream reads are decoupled from the target
        // files the autocorrect pass may overwrite below. A live target is
        // never overwritten file-wise, so its report can stay lazy.
        val classified =
          if (liveTarget) graft.jobs.DiffData.classify(origin, target, cfg.schema.primaryKey)
          else {
            val reportTable = s"${targetTable}_diff_report"
            TableIO.write(
              graft.jobs.DiffData.classify(origin, target, cfg.schema.primaryKey),
              cfg.target.path, reportTable)
            TableIO.read(spark, cfg.target.path, reportTable)
          }
        // A5: autocorrect — MISSING re-inserted / MISMATCH overwritten per
        // flags. Live cluster: CQL upserts are in-place by PK, so the
        // corrections write directly through the connector. Parquet
        // stand-in: last-writer-wins merge through a staging table,
        // because a parquet overwrite cannot read its own input path.
        if (cfg.autocorrect.missing || cfg.autocorrect.mismatch) {
          val corrections = graft.jobs.DiffData
            .autocorrectRows(classified, cfg.autocorrect.missing, cfg.autocorrect.mismatch)
            .drop("diff_class", "diff_cols")
          if (liveTarget) {
            CassandraTableIO.write(corrections, cfg.target, targetTable, Some(cfg.perf))
          } else {
            val merged = Upsert.lastWriterWins(
              target.withColumn("__w", lit(0L)),
              corrections.withColumn("__w", lit(1L)),
              cfg.schema.primaryKey, "__w").drop("__w")
            val staging = s"${targetTable}__staging"
            TableIO.write(merged, cfg.target.path, staging)
            TableIO.write(TableIO.read(spark, cfg.target.path, staging), cfg.target.path, targetTable)
          }
        }
        classified

      case GuardrailCheck =>
        Guardrail.check(
          TableIO.read(spark, cfg.origin, cfg.schema.table, Some(cfg.perf)),
          cfg.schema.primaryKey,
          // colSizeInKB=0 means "report nothing" upstream; model as no threshold hit
          if (cfg.guardrail.colSizeInKB <= 0) Long.MaxValue
          else cfg.guardrail.colSizeInKB.toLong * 1024L)
    }
}
