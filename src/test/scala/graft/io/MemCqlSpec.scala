package graft.io

import graft.SparkSpec
import graft.config.CdmConfig
import graft.jobs.JobDispatch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, IsNotNull}

/**
 * The Cassandra-connector seam, executed: Migrate / DiffData / Guardrail
 * run END-TO-END against the in-memory CQL-shaped DSv2 backend
 * ([[MemCqlProvider]]), through the REAL [[CassandraTableIO]] read/write
 * code (option map, keyspace split, append mode) — converting the
 * connector-path claims (predicate pushdown into the source, pruned
 * SELECT lists, partition-grouped upsert batches) from assertions into
 * green specs. SURVEY §2.2 S1–S3.
 */
class MemCqlSpec extends SparkSpec {
  import spark.implicits._

  private val Origin = "mem-origin"
  private val Target = "mem-target"

  /** CdmConfig whose clusters are LIVE (host set) so TableIO dispatches
   * through CassandraTableIO; the mem provider resolves the host string
   * as the cluster id. */
  private def cfg(extra: (String, String)*): CdmConfig = CdmConfig.fromMap(Map(
    "spark.cdm.connect.origin.host" -> Origin,
    "spark.cdm.connect.target.host" -> Target,
    "spark.cdm.schema.origin.keyspaceTable" -> "lineitem",
    "spark.cdm.schema.origin.primaryKey" -> "l_orderkey,l_linenumber",
    "spark.cdm.perfops.batchSize" -> "4"
  ) ++ extra)

  /** Seed both mem clusters from the parquet fixture: origin holds a
   * lineitem slice, target starts empty with the same shape. Returns a
   * REFERENCE frame mirroring the store's CQL upsert identity — the
   * fixture carries duplicate full-PK rows (the counter-delta model), and
   * a CQL table keeps only the last write per PK, so comparisons must go
   * through the same dedup. */
  private def seed(): DataFrame = {
    MemCqlStore.dropAll()
    val li = TableIO.read(spark, Sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus")
      .filter($"l_orderkey" < 500)
    MemCqlStore.create(Origin, "lineitem", li.schema,
      primaryKey = Seq("l_orderkey", "l_linenumber"), partitionKey = Seq("l_orderkey"))
    MemCqlStore.insert(Origin, "lineitem", li.collect().map(_.toSeq).toSeq)
    MemCqlStore.create(Target, "lineitem", li.schema,
      primaryKey = Seq("l_orderkey", "l_linenumber"), partitionKey = Seq("l_orderkey"))
    val surviving = MemCqlStore.get(Origin, "lineitem").rows.values
      .map(org.apache.spark.sql.Row.fromSeq).toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(surviving, 4), li.schema)
  }

  private def withMemBackend(body: => Unit): Unit =
    withConf(CassandraTableIO.FormatConf -> "graft.io.MemCqlProvider")(body)

  test("migrate runs e2e: filters push into the source, writes land as partition-grouped batches") {
    val li = seed()
    withMemBackend {
      val c = cfg("spark.cdm.filter.cassandra.whereCondition" -> "l_quantity > 25.0")
      JobDispatch.run(spark, "migrate", c)

      // ORIGIN scan: the WHERE predicate reached the source as a pushed
      // filter (the CQL-expressible part), not a post-scan Spark filter
      val scan = MemCqlStore.get(Origin, "lineitem").lastScan.get
      assert(scan.pushed.exists {
        case GreaterThan("l_quantity", v) => v.toString.toDouble == 25.0
        case _ => false
      }, s"WHERE not pushed: ${scan.pushed}")
      // the engine also derives NOT NULL for compared columns
      assert(scan.pushed.contains(IsNotNull("l_quantity")) || scan.residual.isEmpty)

      // TARGET state: exactly the filtered origin rows, upserted by PK
      val expected = li.filter($"l_quantity" > 25.0).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      val got = MemCqlStore.get(Target, "lineitem").rows.keysIterator
        .map(k => (k.head.asInstanceOf[Long], k(1).asInstanceOf[Int])).toSet
      assert(got == expected, s"target rows ${got.size} != expected ${expected.size}")

      // WRITE path: unlogged batches grouped by partition key at the
      // configured cap — no batch mixes partition keys (asserted inside
      // the sink commit), none exceeds perfops.batchSize
      val w = MemCqlStore.get(Target, "lineitem").lastWrite.get
      assert(w.groupingKey == "partition")
      assert(w.batchRowCap == 4)
      assert(w.totalRows == expected.size)
      assert(w.maxBatchRows <= 4)
      // partition grouping is real: fewer batches than rows (multi-row
      // partitions exist in lineitem's orderkey distribution)
      assert(w.numBatches < w.totalRows)
    }
  }

  test("migrate prunes the SELECT list to the projected columns") {
    seed()
    withMemBackend {
      // skip two columns → the source must only be asked for the rest
      val c = cfg("spark.cdm.schema.origin.column.skip" -> "l_returnflag,l_linestatus")
      JobDispatch.run(spark, "migrate", c)
      val scan = MemCqlStore.get(Origin, "lineitem").lastScan.get
      assert(scan.requiredColumns.toSet == Set("l_orderkey", "l_linenumber", "l_quantity"),
        s"scan fetched ${scan.requiredColumns}")
    }
  }

  test("validate runs e2e live→live: clean after migrate; detects and autocorrects a mutation") {
    val li = seed()
    withMemBackend {
      val c = cfg()
      JobDispatch.run(spark, "migrate", c)

      // clean validate: everything VALID
      val report1 = JobDispatch.run(spark, "validate", c)
      assert(report1.filter($"diff_class" =!= graft.jobs.DiffData.Valid).count() == 0)

      // mutate one target row through the connector write path (upsert);
      // pick a key that actually exists in the slice
      val victim = MemCqlStore.get(Target, "lineitem").rows.keys.head
      val (vOrder, vLine) = (victim.head.asInstanceOf[Long], victim(1).asInstanceOf[Int])
      val mutated = li.filter($"l_orderkey" === vOrder && $"l_linenumber" === vLine)
        .withColumn("l_quantity", lit(999.0))
      assert(mutated.count() == 1)
      CassandraTableIO.write(mutated, c.target, "lineitem", Some(c.perf))

      // validate again WITH autocorrect: the report (a consistent
      // snapshot — JobDispatch localCheckpoints it) shows the mismatch...
      val c2 = cfg("spark.cdm.autocorrect.mismatch" -> "true")
      val report2 = JobDispatch.run(spark, "validate", c2)
      val mism = report2.filter($"diff_class" === graft.jobs.DiffData.Mismatch).collect()
      assert(mism.length == 1 && mism.head.getAs[Long]("l_orderkey") == vOrder)
      assert(mism.head.getAs[String]("diff_cols").contains("l_quantity"))

      // ...and the correction was written back through the connector:
      // target row restored to the origin value
      val fixed = MemCqlStore.get(Target, "lineitem").rows(victim)
      val schema = MemCqlStore.get(Target, "lineitem").schema
      assert(fixed(schema.fieldIndex("l_quantity")) ==
        li.filter($"l_orderkey" === vOrder && $"l_linenumber" === vLine)
          .head().getAs[Double]("l_quantity"))

      // a third validate is clean again
      val report3 = JobDispatch.run(spark, "validate", cfg())
      assert(report3.filter($"diff_class" =!= graft.jobs.DiffData.Valid).count() == 0)
    }
  }

  test("validate classifies missing target rows and reinserts them with autocorrect.missing") {
    val li = seed()
    withMemBackend {
      JobDispatch.run(spark, "migrate", cfg())
      // drop some target rows directly in the store (simulated data loss)
      val st = MemCqlStore.get(Target, "lineitem")
      val dropped = st.rows.keys.take(7).toSeq
      MemCqlStore.synchronized(dropped.foreach(st.rows.remove))

      val report = JobDispatch.run(spark, "validate",
        cfg("spark.cdm.autocorrect.missing" -> "true"))
      assert(report.filter($"diff_class" === graft.jobs.DiffData.Missing).count() == 7)
      // reinserted: target is whole again
      assert(st.rows.size == li.count())
    }
  }

  test("guardrail runs e2e against the live origin") {
    MemCqlStore.dropAll()
    val docs = TableIO.read(spark, Sf, "documents").select("doc_id", "text", "lang")
    MemCqlStore.create(Origin, "documents", docs.schema, primaryKey = Seq("doc_id"))
    // inflate every 25th doc past the 1 KiB guardrail (the fixture's
    // texts are all under it) so the violation set is known and non-empty
    val oversized = "x" * 2048
    val seeded = docs.collect().map(_.toSeq).toSeq.map { r =>
      val id = r.head.asInstanceOf[Long]
      if (id % 25 == 0) r.updated(1, r(1).asInstanceOf[String] + oversized) else r
    }
    MemCqlStore.insert(Origin, "documents", seeded)
    withMemBackend {
      val c = CdmConfig.fromMap(Map(
        "spark.cdm.connect.origin.host" -> Origin,
        "spark.cdm.connect.target.host" -> Target,
        "spark.cdm.schema.origin.keyspaceTable" -> "documents",
        "spark.cdm.schema.origin.primaryKey" -> "doc_id",
        "spark.cdm.feature.guardrail.colSizeInKB" -> "1"))
      val report = JobDispatch.run(spark, "guardrail", c)
      val expected = seeded.count(r =>
        r(1).asInstanceOf[String].getBytes("UTF-8").length > 1024)
      assert(report.count() == expected && expected > 0)
    }
  }

  test("the scan parallelizes into token-range groups and batch reads respect residual filters") {
    seed()
    withMemBackend {
      val c = cfg()
      val df = CassandraTableIO.read(spark, c.origin, "lineitem", Some(c.perf))
      // token-range-group parallelism: 4 splits by default
      assert(df.rdd.getNumPartitions == 4)
      // a non-CQL-expressible predicate stays residual in Spark but the
      // result is still correct (Spark applies it above the scan)
      val odd = df.filter(pmod($"l_orderkey", lit(2)) === 1)
      val ref = MemCqlStore.get(Origin, "lineitem").rows.keysIterator
        .count(k => k.head.asInstanceOf[Long] % 2 == 1)
      assert(odd.count() == ref)
    }
  }
}
