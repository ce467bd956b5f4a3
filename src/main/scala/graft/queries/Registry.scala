package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One harness-registered query: a Spark implementation (exercising the real
 * operator code under graft.ops / graft.jobs / graft.ext) plus, when the
 * semantics are ANSI-SQL-expressible, the DuckDB oracle SQL the driver
 * hash-compares against (SURVEY.md §5.2).
 *
 * Determinism contract for every entry (SURVEY.md §7.5):
 *  - explicit ORDER BY on a unique key, in both Spark and oracle;
 *  - identical output column names/aliases on both sides;
 *  - no cross-engine floating aggregation: sums/avgs go through exact
 *    DECIMAL accumulation, cast back to double at the end;
 *  - timestamps at µs precision, session TZ pinned UTC.
 */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)
