package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.CdmConfig
import graft.io.TableIO
import graft.jobs.Migrate
import graft.ops.{Filters, Projection}

/**
 * Harness queries for the scan/projection/filter surface (SURVEY.md §2.2
 * S1, §2.3 P1–P8), each built on the real Migrate/Filters operator code so
 * the oracle comparison doubles as an integration test of J1.
 */
object CoreQueries {

  private def cfg(dir: String, extra: Map[String, String] = Map.empty): CdmConfig =
    CdmConfig.fromMap(Map(
      "spark.cdm.connect.origin.path" -> dir,
      "spark.cdm.schema.origin.keyspaceTable" -> "lineitem",
      "spark.cdm.schema.origin.primaryKey" -> "l_orderkey,l_linenumber"
    ) ++ extra)

  /** Non-null-PK guard shared by migrate-path oracles (P8 always runs). */
  private val PkGuard = "l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL"

  val all: Seq[Q] = Seq(

    // S1/P1 — token-range-parallel full-table scan with projection pushdown.
    Q("scan_lineitem",
      (s, dir) => Migrate.plan(s, cfg(dir))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic
        // fixture (FIXTURES.md notwithstanding), so the ORDER BY covers
        // every output column — ties are then bit-identical rows and the
        // oracle compare is order-stable.
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"),
      Some(s"""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
              |FROM lineitem WHERE $PkGuard
              |ORDER BY 1, 2, 3, 4, 5""".stripMargin)),

    // P2 — origin→target column rename map.
    Q("rename_project",
      (s, dir) => Migrate.plan(s, cfg(dir, Map(
          "spark.cdm.schema.origin.column.names.to.target" ->
            "l_orderkey:order_id,l_linenumber:line_no,l_quantity:qty",
          "spark.cdm.schema.origin.column.skip" ->
            "l_tax,l_returnflag,l_linestatus,l_shipdate,l_discount,l_extendedprice,l_partkey,l_suppkey")))
        .orderBy("order_id", "line_no", "qty"),
      Some(s"""SELECT l_orderkey AS order_id, l_linenumber AS line_no, l_quantity AS qty
              |FROM lineitem WHERE $PkGuard
              |ORDER BY 1, 2, 3""".stripMargin)),

    // P3 — pushed-down WHERE condition (reference appends it to the origin
    // CQL; here Catalyst pushes it into the parquet scan).
    Q("filter_where",
      (s, dir) => Migrate.plan(s, cfg(dir, Map(
          "spark.cdm.filter.cassandra.whereCondition" ->
            "l_shipdate >= TIMESTAMP '1995-06-01 00:00:00' AND l_discount > 0.05")))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_shipdate", "l_discount"),
      Some(s"""SELECT l_orderkey, l_linenumber, l_shipdate, l_discount
              |FROM lineitem
              |WHERE l_shipdate >= TIMESTAMP '1995-06-01 00:00:00' AND l_discount > 0.05 AND $PkGuard
              |ORDER BY 1, 2, 3, 4""".stripMargin)),

    // P4 — token sub-ring restriction over the deterministic ring stand-in
    // (((pk mod 2^31) * 2654435761) mod 2^31 — TableIO.tokenOf; SURVEY.md §7.4).
    Q("filter_token_range",
      (s, dir) => Migrate.plan(s, cfg(dir, Map(
          "spark.cdm.filter.cassandra.partition.min" -> "100000000",
          "spark.cdm.filter.cassandra.partition.max" -> "1000000000")))
        .select(col("l_orderkey"), col("l_linenumber"),
          TableIO.tokenOf(col("l_orderkey")).as("ring_token"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some(s"""SELECT l_orderkey, l_linenumber,
              |  ((l_orderkey % 2147483648) * 2654435761) % 2147483648 AS ring_token
              |FROM lineitem
              |WHERE ((l_orderkey % 2147483648) * 2654435761) % 2147483648 BETWEEN 100000000 AND 1000000000
              |  AND $PkGuard
              |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // P5 — writetime window (incremental migration): events.ts models the
    // cell writetime (µs since epoch), window = [2024-01-05, 2024-01-20).
    Q("filter_writetime",
      (s, dir) => {
        val events = TableIO.read(s, dir, "events")
          .withColumn("row_writetime", unix_micros(col("ts")))
        Filters.writetimeWindow(events, col("row_writetime"),
            1704412800000000L, 1705708799999999L)
          .select("event_id", "row_writetime")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, epoch_us(ts) AS row_writetime
             |FROM events
             |WHERE epoch_us(ts) BETWEEN 1704412800000000 AND 1705708799999999
             |ORDER BY event_id""".stripMargin)),

    // P6 — column-value skip filter (drop rows whose column matches).
    Q("filter_column_value",
      (s, dir) => Filters.columnValue(TableIO.read(s, dir, "events"), "event_type", "error")
        .select("event_id", "event_type", "value")
        .orderBy("event_id"),
      // IS DISTINCT FROM mirrors the Spark side's null-safe !(col <=> lit):
      // rows with NULL event_type are KEPT (a bare != would drop them).
      Some("""SELECT event_id, event_type, value
             |FROM events
             |WHERE event_type IS DISTINCT FROM 'error'
             |ORDER BY event_id""".stripMargin)),

    // P7 — deterministic token-percent sampling (15% of the ring).
    Q("filter_token_percent",
      (s, dir) => Migrate.plan(s, cfg(dir, Map(
          "spark.cdm.filter.java.token.percent" -> "15")))
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber"),
      Some(s"""SELECT l_orderkey, l_linenumber
              |FROM lineitem
              |WHERE ((((l_orderkey % 2147483648) * 2246822519) % 2147483648) * 100) >> 31 < 15
              |  AND $PkGuard
              |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // S1/P4 production-parity path — the EXACT Cassandra Murmur3 ring
    // token (not the arithmetic stand-in) partitioning the scan into the
    // same 4 ranges a live cluster's SplitPartitions would own. DuckDB
    // cannot evaluate Cassandra's murmur3, so this is registered without
    // an oracle (rows-only check); Murmur3RingSpec pins the hash itself
    // against Guava.
    Q("cassandra_token_ranges",
      (s, dir) => TableIO.read(s, dir, "orders")
        .select(col("o_orderkey"), TableIO.cassandraTokenOf(col("o_orderkey")).as("ring_token"))
        // integer shift, not division: long/long is double division in
        // Spark and misassigns tokens within ~512 of range boundaries
        .groupBy((shiftright(col("ring_token"), 62) + lit(2)).as("range_id"))
        .agg(count(lit(1)).as("n"), min("ring_token").as("min_token"), max("ring_token").as("max_token"))
        .orderBy("range_id"),
      // Graduated from rows-only (r18): OracleMurmur evaluates the exact
      // Cassandra murmur3 ring in pure DuckDB SQL (HUGEINT wrap
      // arithmetic) — a third independent implementation next to the
      // engine kernel and the Guava-pinned spec reference.
      Some(s"""WITH src AS (SELECT o_orderkey FROM orders),
              |${OracleMurmur.murmurCtes("__m", "src",
                  OracleMurmur.bigintBytes("o_orderkey"),
                  Seq("o_orderkey"), "ring_token")}
              |SELECT CAST(${OracleMurmur.rangeId("ring_token")} AS BIGINT) AS range_id,
              |       count(*) AS n,
              |       min(ring_token) AS min_token,
              |       max(ring_token) AS max_token
              |FROM __m8
              |GROUP BY 1
              |ORDER BY range_id""".stripMargin)),

    // S1+/P4 — the same 4-range split for a TEXT partition key and for a
    // composite (bigint, text) key: the general block-loop murmur3 over
    // CQL/CompositeType serializations. Graduated from rows-only (r18):
    // two chained OracleMurmur CTE pipelines — UTF-8 text bytes, then the
    // CompositeType framing (len|bytes|0x00 per component) — exercise the
    // block loop AND the signed-tail quirk path cross-engine.
    Q("cassandra_token_ranges_text",
      (s, dir) => {
        val c = TableIO.read(s, dir, "customer")
        c.select(
            TableIO.cassandraTokenOfKey(Seq(col("c_name"))).as("t_text"),
            TableIO.cassandraTokenOfKey(Seq(col("c_custkey"), col("c_name"))).as("t_comp"))
          .groupBy((shiftright(col("t_text"), 62) + lit(2)).as("range_id"))
          .agg(
            count(lit(1)).as("n_text"),
            min("t_text").as("min_text_token"),
            countDistinct(shiftright(col("t_comp"), 62)).as("comp_ranges_hit"))
          .orderBy("range_id")
      },
      Some(s"""WITH src AS (SELECT c_custkey, c_name FROM customer),
              |${OracleMurmur.murmurCtes("__mt", "src",
                  OracleMurmur.textBytes("c_name"),
                  Seq("c_custkey", "c_name"), "t_text")},
              |${OracleMurmur.murmurCtes("__mc", "__mt8",
                  OracleMurmur.compositeBigintText("c_custkey", "c_name"),
                  Seq("c_custkey", "c_name", "t_text"), "t_comp")}
              |SELECT CAST(${OracleMurmur.rangeId("t_text")} AS BIGINT) AS range_id,
              |       count(*) AS n_text,
              |       min(t_text) AS min_text_token,
              |       count(DISTINCT ${OracleMurmur.rangeId("t_comp")}) AS comp_ranges_hit
              |FROM __mc8
              |GROUP BY 1
              |ORDER BY range_id""".stripMargin)),

    // S8 end-to-end — the ENTIRE wrapper config path in one query: env
    // vars (CDM_PROPERTY_* + env: indirection) → properties → CdmConfig →
    // Migrate.plan. Output equals the same pipeline configured directly,
    // so the oracle doubles as a rewrite-engine integration check.
    Q("env_config_migrate",
      (s, dir) => Migrate.plan(s, graft.config.EnvProperties.configFromEnv(Map(
          "CDM_PROPERTY_SPARK_CDM_CONNECT_ORIGIN_PATH" -> "env:GRAFT_SF_DIR",
          "GRAFT_SF_DIR" -> dir,
          "CDM_PROPERTY_SPARK_CDM_SCHEMA_ORIGIN_KEYSPACETABLE" -> "lineitem",
          "CDM_PROPERTY_SPARK_CDM_SCHEMA_ORIGIN_PRIMARYKEY" -> "l_orderkey,l_linenumber",
          "CDM_PROPERTY_SPARK_CDM_FILTER_CASSANDRA_WHERECONDITION" -> "l_quantity > 45",
          "CDM_PROPERTY_SPARK_CDM_SCHEMA_ORIGIN_COLUMN_SKIP" ->
            "l_tax,l_returnflag,l_linestatus,l_shipdate,l_discount,l_extendedprice,l_partkey,l_suppkey")))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity"),
      Some(s"""SELECT l_orderkey, l_linenumber, l_quantity
              |FROM lineitem
              |WHERE l_quantity > 45 AND $PkGuard
              |ORDER BY 1, 2, 3""".stripMargin)),

    // P8 — null-PK skip. The fixtures have no null PKs, so a synthetic
    // nullable PK component (nullif) exercises the guard.
    Q("skip_null_pk",
      (s, dir) => {
        val df = TableIO.read(s, dir, "lineitem")
          .withColumn("pk_part", expr("nullif(l_linenumber, 3)"))
        Filters.nonNullPk(df, Seq("l_orderkey", "pk_part"))
          .select("l_orderkey", "l_linenumber", "pk_part")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, nullif(l_linenumber, 3) AS pk_part
             |FROM lineitem
             |WHERE l_orderkey IS NOT NULL AND nullif(l_linenumber, 3) IS NOT NULL
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // S1+ — JSON-lines source/sink round-trip: documents exported as
    // jsonl (the interchange format corpora arrive in), read back with an
    // EXPLICIT schema (inference is an extra full pass at 100 TB), and
    // aggregated. The oracle reads the original parquet — equality proves
    // the text (embedded quotes/newlines) survived the round-trip byte-
    // for-byte, sum(length(text)) being the content witness.
    Q("jsonl_roundtrip",
      (s, dir) => {
        val docs = TableIO.read(s, dir, "documents")
        val path = s"/tmp/graft_jsonl_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
        TableIO.writeJsonLines(docs, path)
        TableIO.readJsonLines(s, path, docs.schema)
          .groupBy("lang", "source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            sum(octet_length(col("text")).cast("long")).as("sum_text_len"))
          .orderBy("lang", "source")
      },
      Some("""SELECT lang, source, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  CAST(sum(strlen(text)) AS BIGINT) AS sum_text_len
             |FROM documents
             |GROUP BY 1, 2
             |ORDER BY 1, 2""".stripMargin)),

    // S1+ — CSV source/sink round-trip with RFC-4180 quoting, explicit
    // schema on read; name lengths + exact DECIMAL balance totals witness
    // the string and numeric columns surviving text serialization.
    Q("csv_roundtrip",
      (s, dir) => {
        val cust = TableIO.read(s, dir, "customer")
        val path = s"/tmp/graft_csv_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
        TableIO.writeCsv(cust, path)
        TableIO.readCsv(s, path, cust.schema)
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("n"),
            sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_bal"),
            sum(octet_length(col("c_name")).cast("long")).as("sum_name_len"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n,
             |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
             |  CAST(sum(strlen(c_name)) AS BIGINT) AS sum_name_len
             |FROM customer
             |GROUP BY 1
             |ORDER BY 1""".stripMargin)),

    // S9+ — ORC source/sink round-trip (the Hive-lineage columnar
    // interchange format): timestamps, doubles, ints and strings survive
    // the format change; the read-back applies a filter + projection so
    // the ORC scan's pushdown/pruning path is what's exercised, not just
    // a blind copy. Oracle = the same aggregate straight off parquet
    // (round-trip identity).
    Q("orc_roundtrip",
      (s, dir) => {
        // a quantity slice (~20% of lineitem) keeps the timed write
        // proportionate while the read-back still exercises ORC pushdown
        // on a second column + the NTZ timestamp/double/string types
        val li = TableIO.read(s, dir, "lineitem").filter(col("l_quantity") > 40)
        // unique per invocation (TableIO.scratchDir): a fixed /tmp path
        // raced between concurrent harness/bench runs over the same data
        // dir, and the overwritten files were never cleaned up
        val path = TableIO.scratchDir("orc")
        TableIO.writeOrc(li, path)
        TableIO.readOrc(s, path, li.schema)
          .filter(col("l_extendedprice") > 1000)
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
            max(col("l_shipdate")).as("max_shipdate"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             |  max(l_shipdate) AS max_shipdate
             |FROM lineitem
             |WHERE l_quantity > 40 AND l_extendedprice > 1000
             |GROUP BY 1
             |ORDER BY 1""".stripMargin))
  )
}
