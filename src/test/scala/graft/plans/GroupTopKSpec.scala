package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.plans.GroupTopK

class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$Sf/documents.parquet")
    .select($"doc_id", $"lang", $"source", length($"text").cast("long").as("n_chars"))

  test("native top-k equals the window formulation") {
    val native = GroupTopK.topkPerKey(docs, Seq("lang"),
        Seq($"n_chars".desc, $"doc_id".asc), k = 5)
      .select("lang", "doc_id", "n_chars")
      .as[(String, Long, Long)].collect().toSet
    val window = docs
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy($"n_chars".desc, $"doc_id".asc)))
      .filter($"rn" <= 5)
      .select("lang", "doc_id", "n_chars")
      .as[(String, Long, Long)].collect().toSet
    assert(native == window)
    // partitioning-invariant (total order via the doc_id tiebreak)
    val again = GroupTopK.topkPerKey(docs.repartition(17), Seq("lang"),
        Seq($"n_chars".desc, $"doc_id".asc), k = 5)
      .select("lang", "doc_id", "n_chars")
      .as[(String, Long, Long)].collect().toSet
    assert(again == native)
  }

  test("plans as a partial/final pair with one exchange between them") {
    val df = GroupTopK.topkPerKey(docs, Seq("lang"), Seq($"n_chars".desc, $"doc_id".asc), 3)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyPartial") && p.contains("TopKPerKeyFinal"),
      s"missing partial/final pair:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one exchange:\n$p")
    // the partial node must sit BELOW the exchange (map side)
    val iPartial = p.indexOf("TopKPerKeyPartial")
    val iExchange = p.indexOf("Exchange hashpartitioning")
    val iFinal = p.indexOf("TopKPerKeyFinal")
    assert(iFinal < iExchange && iExchange < iPartial,
      s"partial not below the exchange:\n$p")
  }

  test("key-only filters push below the operator to the scan") {
    val topk = GroupTopK.topkPerKey(docs, Seq("lang"), Seq($"n_chars".desc, $"doc_id".asc), 3)
    val filtered = topk.filter($"lang" === "en")
    val p = filtered.queryExecution.executedPlan.toString
    // the rule moved the predicate below TopKPerKey, so it reaches the
    // parquet scan as a pushed filter
    assert(p.contains("PushedFilters:") && p.contains("EqualTo(lang,en)"),
      s"key filter did not reach the scan:\n$p")
    // a filter on a NON-key column must NOT move below (it would change
    // which rows compete within a group)
    val nonKey = topk.filter($"source" === "src0")
    val rows = nonKey.select("doc_id").as[Long].collect().toSet
    val expected = GroupTopK.topkPerKey(docs, Seq("lang"), Seq($"n_chars".desc, $"doc_id".asc), 3)
      .collect().filter(_.getAs[String]("source") == "src0").map(_.getAs[Long]("doc_id")).toSet
    assert(rows == expected)
    val pn = nonKey.queryExecution.optimizedPlan.toString
    assert(!pn.contains("PushedFilters: [IsNotNull(source), EqualTo(source,src0)]") ||
      pn.indexOf("src0") < pn.indexOf("TopKPerKey"),
      s"non-key filter was pushed below top-k:\n$pn")
  }

  test("ties beyond the order are bounded by k and heap never exceeds k per group") {
    // 1000 identical-order rows in one group: exactly k survive
    val df = Seq.tabulate(1000)(i => ("g", 7L, i.toLong)).toDF("g", "v", "id")
    val out = GroupTopK.topkPerKey(df, Seq("g"), Seq($"v".desc, $"id".asc), k = 4)
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(0L, 1L, 2L, 3L))
  }

  test("final group cap: cap-exceeded partitions degrade to the sorted form, result stays exact") {
    // 5000 distinct groups against a final cap of 16: every reduce
    // partition blows past the heap-map cap and takes the external-sort
    // fallback; the answer must be identical to the uncapped run.
    val df = Seq.tabulate(20000)(i => (i.toLong % 5000, (i * 37 % 101).toLong, i.toLong))
      .toDF("g", "v", "id")
    val expected = GroupTopK.topkPerKey(df, Seq("g"), Seq($"v".desc, $"id".asc), k = 2)
      .select("g", "id").as[(Long, Long)].collect().toSet
    withConf("spark.graft.topk.finalGroupCap" -> "16") {
      val out = GroupTopK.topkPerKey(df, Seq("g"), Seq($"v".desc, $"id".asc), k = 2)
        .select("g", "id").as[(Long, Long)].collect().toSet
      assert(out == expected)
      assert(out.size == 10000) // 2 survivors per group, all groups present
    }
    // both caps undersized at once: partial passes rows through untrimmed
    // AND final degrades to the sort — the exact contract must still hold
    withConf(
      "spark.graft.topk.partialGroupCap" -> "4",
      "spark.graft.topk.finalGroupCap" -> "16") {
      val out = GroupTopK.topkPerKey(df, Seq("g"), Seq($"v".desc, $"id".asc), k = 2)
        .select("g", "id").as[(Long, Long)].collect().toSet
      assert(out == expected)
    }
  }

  test("a million distinct groups in one partition stay exact under DEFAULT caps") {
    // The 100 TB risk case: group cardinality far above both caps inside a
    // single task. 1.2M distinct groups coalesced to ONE partition —
    // SinglePartition satisfies ClusteredDistribution, so the final exec
    // really sees 1.2M groups in one task, past the default 2^20 final
    // cap: the partial pass-through AND the external-sort degrade both
    // fire at production settings, not test-shrunk ones. Memory stays
    // bounded (cap·k heap entries + a spill-safe sort); the answer is
    // checked against an independent aggregate formulation without
    // materializing the 1.2M-row result on the driver.
    val groups = 1200000L
    val df = spark.range(2 * groups).select(
      (col("id") % groups).as("g"),
      (col("id") * 37 % 101).as("v"),
      col("id").as("id")).coalesce(1)
    val out = GroupTopK.topkPerKey(df, Seq("g"), Seq($"v".desc, $"id".asc), k = 1)
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"), sum($"id").as("si"))
      .as[(Long, Long, Long)].head()
    // survivor per group = (max v, min id among ties) = min of (-v, id)
    val exp = df.groupBy("g")
      .agg(min(struct((-$"v").as("nv"), $"id")).as("s"))
      .agg(count(lit(1)).as("n"), sum(-$"s.nv").as("sv"), sum($"s.id").as("si"))
      .as[(Long, Long, Long)].head()
    assert(out == exp)
    assert(out._1 == groups)
  }

  test("partial group cap: near-unique keys pass through untrimmed, result stays exact") {
    // 5000 distinct keys force the partial exec past a tiny cap, so most
    // rows take the pass-through path; the final exec must still produce
    // the exact per-group top-k.
    val df = Seq.tabulate(10000)(i => (i.toLong % 5000, i.toLong, i.toLong)).toDF("g", "v", "id")
    withConf("spark.graft.topk.partialGroupCap" -> "8") {
      val out = GroupTopK.topkPerKey(df, Seq("g"), Seq($"v".desc, $"id".asc), k = 1)
        .select("g", "id").as[(Long, Long)].collect().toMap
      assert(out.size == 5000)
      // top row per key g is the second occurrence: id = g + 5000
      assert(out(0L) == 5000L && out(4999L) == 9999L && out(17L) == 5017L)
    }
  }
}
