package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantics + plan pins for the curation operators: two-phase top-k
 * equivalence, deterministic sampling, priority survivors, histogram
 * arithmetic, PII scrub. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("topkPerGroup equals the single-window formulation") {
    val df = graft.io.TableIO.read(spark, Sf, "documents")
      .select(col("doc_id"), col("lang"), length(col("text")).cast("long").as("len"))
    val twoPhase = Curation.topkPerGroup(df, Seq("lang"),
        Seq(col("len").desc, col("doc_id").asc), k = 5)
      .select("lang", "rank", "doc_id", "len")
    val oneWindow = df
      .withColumn("rank", row_number().over(
        Window.partitionBy("lang").orderBy(col("len").desc, col("doc_id").asc)))
      .filter(col("rank") <= 5)
      .select("lang", "rank", "doc_id", "len")
    assert(twoPhase.exceptAll(oneWindow).isEmpty && oneWindow.exceptAll(twoPhase).isEmpty)
  }

  test("topkPerGroup returns at most k rows per group, ranks 1..k") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b")).toDF("id", "g")
    val out = Curation.topkPerGroup(df, Seq("g"), Seq(col("id").asc), k = 2)
      .select($"g", $"rank", $"id").as[(String, Int, Long)].collect().sorted
    assert(out.toSeq === Seq(("a", 1, 1L), ("a", 2, 2L), ("b", 1, 4L)))
  }

  test("stratifiedSample is a pure function of the id (rerun- and partitioning-stable)") {
    val df = graft.io.TableIO.read(spark, Sf, "documents")
    val a = Curation.stratifiedSample(df, "lang", col("doc_id"), Map("en" -> 60), 20)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Curation.stratifiedSample(df.repartition(7), "lang", col("doc_id"), Map("en" -> 60), 20)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a === b && a.nonEmpty && a.size < 500)
  }

  test("stratifiedSample honors 0 and 100 percent strata") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "g")
    val none = Curation.stratifiedSample(df, "g", col("id"), Map("x" -> 0), 0)
    assert(none.count() === 0)
    val all = Curation.stratifiedSample(df, "g", col("id"), Map("x" -> 100), 100)
    assert(all.count() === 3)
  }

  test("keepByPriority keeps the highest-priority row per key") {
    val df = Seq(
      ("k1", "crawl", 10L), ("k1", "curated", 20L),
      ("k2", "crawl", 30L)).toDF("key", "src", "id")
    val prio = when(col("src") === "curated", lit(0)).otherwise(lit(1))
    val out = Curation.keepByPriority(df, Seq("key"), Seq(prio.asc, col("id").asc))
      .select($"key", $"id").as[(String, Long)].collect().sorted
    assert(out.toSeq === Seq(("k1", 20L), ("k2", 30L)))
  }

  test("histogram buckets by integer division with min/max envelopes") {
    val df = Seq(0L, 5L, 19L, 20L, 39L, 40L).toDF("v")
    val out = Curation.histogram(df, col("v"), 20L)
      .select($"bucket", $"n", $"min_v", $"max_v").as[(Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(out.toSeq === Seq((0L, 3L, 0L, 19L), (1L, 2L, 20L, 39L), (2L, 1L, 40L, 40L)))
  }

  test("scrubPii redacts emails and phones; counts audit the patterns") {
    val out = Seq("mail me at jo.e1@ex-a.org or 555-12345 x", "clean text")
      .toDF("t")
      .select(
        TextOps.scrubPii(col("t")).as("s"),
        TextOps.emailCount(col("t")).as("e"),
        TextOps.phoneCount(col("t")).as("p"))
      .as[(String, Int, Int)].collect()
    assert(out(0) === (("mail me at <EMAIL> or <PHONE> x", 1, 1)))
    assert(out(1) === (("clean text", 0, 0)))
  }

  test("importanceWeights scores target-identical corpora at exactly 1.0 per token") {
    // when the target IS the whole corpus, every bucket ratio is exactly
    // 1e6 (the integer arithmetic cancels), so score = n_tokens * 1e6 and
    // nothing is "more target-like than average"
    val df = Seq((1L, "a b c"), (2L, "d e"), (3L, "a a f g h")).toDF("doc_id", "text")
    val all = Curation.importanceWeights(df, "doc_id", "text", isTarget = lit(true))
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "score_us", "target_like")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(all == Seq((1L, 3L, 3000000L, 0), (2L, 2L, 2000000L, 0), (3L, 5L, 5000000L, 0)))
    // a real target slice must move scores off the uniform point and be
    // partitioning-invariant
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val w1 = Curation.importanceWeights(docs, "doc_id", "text", col("source") === "src0")
      .orderBy("doc_id").as[(Long, Long, Long, Int)].collect().toSeq
    val w2 = Curation.importanceWeights(docs.repartition(11), "doc_id", "text", col("source") === "src0")
      .orderBy("doc_id").as[(Long, Long, Long, Int)].collect().toSeq
    assert(w1 == w2)
    assert(w1.exists(_._4 == 1) && w1.exists(_._4 == 0))
  }

  test("helper/output column collisions fail fast instead of silently overwriting") {
    val withRank = Seq((1L, "g", 9L)).toDF("id", "g", "rank")
    intercept[IllegalArgumentException](
      Curation.topkPerGroup(withRank, Seq("g"), Seq(col("id").asc), k = 1))
    val withRn = Seq((1L, "g")).toDF("__rn", "g")
    intercept[IllegalArgumentException](
      Curation.keepByPriority(withRn, Seq("g"), Seq(col("__rn").asc)))
  }

  test("importanceWeights raises on an empty target slice instead of null scores") {
    val df = Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      Curation.importanceWeights(df, "doc_id", "text", isTarget = lit(false)).collect()
    }
    assert(ex.getMessage.contains("target slice is empty") ||
      Option(ex.getCause).exists(_.getMessage.contains("target slice is empty")),
      s"unexpected error: ${ex.getMessage}")
  }

  test("stratifiedSample hash stays in int64 for ids beyond 2^31") {
    // raw id * 2654435761 overflows past id ~ 3.47e9; the masked form
    // must agree with the documented ((id mod 2^31) * c) mod 100 exactly
    val big = Seq(5000000000L, Long.MaxValue, 3474000000L).toDF("id")
      .withColumn("lang", lit("en"))
    val kept = Curation.stratifiedSample(big, "lang", col("id"), Map.empty, defaultPct = 50)
      .select("id").as[Long].collect().toSet
    val expected = Seq(5000000000L, Long.MaxValue, 3474000000L)
      .filter(id => ((id % 2147483648L) * 2654435761L) % 100L < 50L).toSet
    assert(kept == expected)
  }

  test("histogram floors negative values instead of merging them into bucket 0") {
    val df = Seq(-150L, -50L, -1L, 0L, 50L, 150L, -100L).toDF("v")
    val out = Curation.histogram(df, col("v"), 100L)
      .select("bucket", "n").as[(Long, Long)].collect().toMap
    // floor semantics: [-200,-100) -> -2, [-100,0) -> -1, [0,100) -> 0
    assert(out == Map(-2L -> 1L, -1L -> 3L, 0L -> 2L, 1L -> 1L), s"got $out")
  }

  test("importanceWeights covers null-text documents with a zero score") {
    val df = Seq(
      (1L, "alpha beta gamma", true),
      (2L, null.asInstanceOf[String], false),
      (3L, "alpha beta", false))
      .toDF("doc_id", "text", "is_t")
    val out = Curation.importanceWeights(df, "doc_id", "text", col("is_t"))
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "target_like").as[(Long, Long, Int)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L), "null-text doc must not vanish")
    assert(out(1) == ((2L, 0L, 0)), s"null-text doc must score neutral-zero: ${out(1)}")
  }

  test("topkPerGroup local pre-prune bounds rows entering the global window") {
    // With 1 input partition and k=2, at most 2 rows per group may cross
    // the shuffle: the filter on the local rank sits BELOW the global
    // window in the plan.
    val df = Seq.tabulate(100)(i => (i.toLong, "g")).toDF("id", "g").coalesce(1)
    val plan = Curation.topkPerGroup(df, Seq("g"), Seq(col("id").asc), k = 2)
      .queryExecution.executedPlan.toString
    // two Window operators (local + global) with a Filter between them
    assert("Window".r.findAllIn(plan).size >= 2, s"expected two windows:\n$plan")
  }

  test("dsirResample: saturation always keeps, zero tokens never keep, verdict matches the rule") {
    import spark.implicits._
    // (id, n_tokens, score_us): w-bar spans zero, sub-cap, exactly cap, above cap
    val weights = Seq(
      (1L, 0L, 0L),               // no tokens -> never kept
      (2L, 10L, 5000000L),        // w-bar = 500_000, accept 25% of ppm space
      (3L, 10L, 20000000L),       // w-bar = cap -> accept_ppm = 1e6, always kept
      (4L, 10L, 99000000L)        // above cap saturates identically
    ).toDF("doc_id", "n_tokens", "score_us")
    val out = Curation.dsirResample(weights, "doc_id", capUs = 2000000L)
      .select("doc_id", "w_avg_us", "accept_ppm", "u_ppm", "kept")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(out(1L)._2 == 0L && out(1L)._4 == 0, s"zero-token doc must never keep: ${out(1L)}")
    assert(out(3L)._2 == 1000000L && out(3L)._4 == 1, s"at-cap doc must always keep: ${out(3L)}")
    assert(out(4L)._2 == 1000000L && out(4L)._4 == 1, s"above-cap doc must always keep: ${out(4L)}")
    // u_ppm lives in [0, 1e6) and the verdict is exactly u < accept
    out.values.foreach { case (_, accept, u, kept) =>
      assert(u >= 0 && u < 1000000L)
      assert(kept == (if (u < accept) 1 else 0))
    }
    // determinism: a different partitioning yields the identical kept set
    val again = Curation.dsirResample(weights.repartition(7), "doc_id", capUs = 2000000L)
      .select("doc_id", "kept").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again == out.map { case (k, v) => k -> v._4 })
  }

  test("mixtureEpochPlan matches exact BigInt arithmetic incl. the 100 TB-scale budget") {
    import spark.implicits._
    // token inventories up to 2.5e13 (a 100 TB-scale source): the naive
    // B*s_w product overflows int64 here; the floor-division identity
    // must still equal exact BigInt floor(B*s/W)
    val rows = Seq(
      ("web", 5L, 25000000000000L),   // s_w = 5e6
      ("books", 3L, 4000000000000L),  // s_w = 2e6
      ("code", 2L, 1000000000000L),   // s_w = 1e6
      ("tiny", 1L, 100L)              // repeat-epochs source
    )
    val budget = 15000000000000L // 1.5e13 tokens
    val df = rows.flatMap { case (s, d, t) =>
      // d docs carrying t tokens total (first doc takes the remainder)
      (0L until d).map(i => (s, if (i == 0) t - (d - 1) * (t / d) else t / d))
    }.toDF("source", "n_tok")
    val got = Curation.mixtureEpochPlan(df, "source", col("n_tok"), budget)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val sw = rows.map { case (_, _, t) => math.sqrt(t.toDouble).floor.toLong }
    val w = sw.sum
    rows.zip(sw).foreach { case ((s, _, t), sv) =>
      val target = (BigInt(budget) * sv / w).toLong
      val (nTok, wppm, tgt, epochs, keep) = got(s)
      assert(nTok == t)
      assert(wppm == (BigInt(sv) * 1000000 / w).toLong)
      assert(tgt == target, s"$s: identity must equal exact BigInt floor")
      assert(epochs == (target + t - 1) / t)
      val expKeep = if (target == 0) 0L
        else if (target % t == 0) 1000000L
        else (BigInt(target % t) * 1000000 / t).toLong
      assert(keep == expKeep)
    }
    // the tiny source is genuinely multi-epoch
    assert(got("tiny")._4 > 1L, s"tiny source must repeat: ${got("tiny")}")
    // budget 0: all-zero plan, keep rate 0 (not the full-epoch 1e6)
    Curation.mixtureEpochPlan(df, "source", col("n_tok"), 0L)
      .collect().foreach { r =>
        assert(r.getLong(4) == 0L && r.getLong(5) == 0L && r.getLong(6) == 0L)
      }
  }
}
