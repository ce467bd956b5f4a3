package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.TextOps
import graft.io.TableIO

/** Dev-only A/B harness: time alternative formulations of a query shape
 * against each other under the bench protocol (noop sink, min of N).
 * Not part of the registered surface — `graft.Bench` is the record. */
object BenchAB {

  def time(label: String, n: Int)(mk: => DataFrame): Double = {
    val ts = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      mk.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val best = ts.min
    println(f"[ab] $label%-28s min=$best%7.3f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    best
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // honor the driver's core count like ExplainR18/Bench do, so probe
    // timings and plan dumps share one bench conf (r18 ADVICE)
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
    val s = spark

    // text_repetition: OLD two-branch join-back form
    def trOld: DataFrame = {
      val docs = TableIO.read(s, sfDir, "documents")
        .withColumn("__toks", TextOps.tokens(col("text")))
      val perDoc = docs.select(col("doc_id"),
        TextOps.dupWordFrac(col("__toks")).as("dup_word_frac"))
      val top = docs
        .select(col("doc_id"), explode_outer(TextOps.bigrams(col("__toks"))).as("bigram"))
        .filter(col("bigram").isNotNull)
        .groupBy("doc_id", "bigram").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_bigrams"), max("c").as("top_bigram_n"))
        .withColumn("top_bigram_frac",
          round(col("top_bigram_n").cast("double") / col("n_bigrams").cast("double"), 6))
      perDoc.join(top, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
          coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"),
          col("dup_word_frac"))
        .orderBy("doc_id")
    }

    // text_repetition: NEW single-lineage form (current registration)
    def trNew: DataFrame = SparkEntry.queries("text_repetition")(s, sfDir)

    val which = if (args.nonEmpty) args(0).split(",").toSet else Set("tr")
    if (which("tr")) {
      time("text_repetition OLD", 3)(trOld)
      time("text_repetition NEW", 3)(trNew)
    }
    if (which("sp")) {
      time("sequence_pack", 3)(SparkEntry.queries("sequence_pack")(s, sfDir))
    }
    // sequence_pack variance triage (r14): is the run-to-run spread the
    // chunk-offset broadcast subplan (which re-executes the range
    // exchange in its own job) or box noise? Variant B materializes the
    // offsets table eagerly before the broadcast so the join-time
    // broadcast build is a ~160-row memory scan.
    if (which("probe_sp")) {
      import org.apache.spark.sql.expressions.Window
      val docs = TableIO.read(s, sfDir, "documents")
      // eager-offsets runs FIRST in this probe so the JVM-warm-up cost
      // lands on it; a cold-cost that follows the SLOT, not the shape,
      // is order bias (fresh-JVM first-query warm-up), not a plan defect
      // variant: offsets branch staged eagerly before the broadcast join
      def eagerOffsets: DataFrame = {
        val seqLen = 512L
        val parts = math.max(s.sparkContext.defaultParallelism * 2,
          s.sessionState.conf.numShufflePartitions)
        val chunked = docs.select(col("lang"), col("doc_id"),
            graft.ext.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
          .localCheckpoint(false)
          .repartitionByRange(parts, col("lang"), col("doc_id"))
          .withColumn("__chunk", spark_partition_id())
        val wLocal = Window.partitionBy("lang", "__chunk").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val local = chunked.withColumn("__local", sum("n_tokens").over(wLocal))
        val wChunk = Window.partitionBy("lang").orderBy("__chunk")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = chunked.groupBy(col("lang"), col("__chunk"))
          .agg(sum("n_tokens").as("__ct"))
          .withColumn("__coff", coalesce(sum("__ct").over(wChunk), lit(0L)))
          .drop("__ct")
          .withColumnRenamed("lang", "__og").withColumnRenamed("__chunk", "__oc")
          .localCheckpoint(true) // EAGER: broadcast build becomes a memory scan
        local.join(broadcast(offsets),
            local("lang") <=> offsets("__og") && local("__chunk") === offsets("__oc"))
          .drop("__og", "__oc")
          .withColumn("start_tok", col("__coff") + col("__local") - col("n_tokens"))
          .withColumn("first_seq", expr(s"start_tok div $seqLen"))
          .withColumn("n_seqs",
            when(col("n_tokens") > 0,
              expr(s"(start_tok + n_tokens - 1) div $seqLen") - col("first_seq") + 1L)
              .otherwise(1L))
          .withColumn("offset_in_seq", expr(s"start_tok % $seqLen"))
          .drop("__chunk", "__local", "__coff")
          .orderBy("lang", "doc_id")
      }
      time("sp eager-offsets (5)", 5)(eagerOffsets)
      time("sp REG (5)", 5)(SparkEntry.queries("sequence_pack")(s, sfDir))
    }
    if (which("fz")) {
      time("fuzzy_match_nn", 4)(SparkEntry.queries("fuzzy_match_nn")(s, sfDir))
    }
    if (which("probe_wau")) {
      val ev = TableIO.read(s, sfDir, "events")
        .select(col("ts"), col("user_id")).filter(col("user_id").isNotNull)
      def shape(rsd: Double) = ev.groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count_distinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), rsd).as("a"))
      time("wau exact only", 3)(ev.groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count_distinct(col("user_id")).as("exact_users")))
      time("wau rsd 0.01", 3)(shape(0.01))
      time("wau rsd 0.02", 3)(shape(0.02))
      time("wau rsd 0.05", 3)(shape(0.05))
      def distinctFirst(rsd: Double) = ev
        .select(window(col("ts"), "1 hour").as("w"), col("user_id")).distinct()
        .groupBy("w")
        .agg(count(lit(1)).as("exact_users"), approx_count_distinct(col("user_id"), rsd).as("a"))
      time("wau distinct-first 0.02", 3)(distinctFirst(0.02))
      val q2 = shape(0.02); q2.write.mode("overwrite").format("noop").save()
      println("[ab] mixed-agg plan Expand: " +
        q2.queryExecution.executedPlan.toString.contains("Expand"))
      val q3 = distinctFirst(0.02); q3.write.mode("overwrite").format("noop").save()
      println("[ab] distinct-first plan Expand: " +
        q3.queryExecution.executedPlan.toString.contains("Expand"))
    }
    if (which("probe_ad")) {
      val docs = TableIO.read(s, sfDir, "documents")
      def base = docs.select(col("lang"), col("doc_id")).filter(col("doc_id").isNotNull)
      time("ad: scan", 3)(base)
      time("ad: distinct", 3)(base.distinct())
      time("ad: + exact agg", 3)(base.distinct().groupBy("lang").agg(count(lit(1)).as("c")))
      time("ad: + approx 0.01", 3)(base.distinct().groupBy("lang")
        .agg(count(lit(1)).as("c"), approx_count_distinct(col("doc_id"), 0.01).as("a")))
      time("ad: + approx 0.05", 3)(base.distinct().groupBy("lang")
        .agg(count(lit(1)).as("c"), approx_count_distinct(col("doc_id"), 0.05).as("a")))
      time("ad: approx only, no distinct", 3)(base.groupBy("lang")
        .agg(approx_count_distinct(col("doc_id"), 0.01).as("a")))
      val q = base.distinct().groupBy("lang")
        .agg(count(lit(1)).as("c"), approx_count_distinct(col("doc_id"), 0.01).as("a"))
      q.write.mode("overwrite").format("noop").save()
      println("[ab] partitions=" + base.rdd.getNumPartitions)
      q.queryExecution.executedPlan.toString.split("\n")
        .filter(l => l.contains("Aggregate") || l.contains("Exchange"))
        .foreach(l => println("[ab] plan: " + l.trim.take(160)))
    }
    if (which("probe_lm")) {
      val P = graft.ext.Dedup.P
      val K = org.apache.spark.sql.graft.SignatureKernels
      val docs = TableIO.read(s, sfDir, "documents")
      val th = K.tokenHashes(TextOps.tokens(col("text")), P)
      def inst = docs
        .select(col("doc_id"), th.as("__th"),
          posexplode(K.shingleHashes2(th, P)).as(Seq("pos", "bh")))
        .select(col("doc_id"), element_at(col("__th"), col("pos") + 1).as("ph"), col("bh"))
      time("lm: scan only", 3)(docs.select(col("doc_id")))
      time("lm: tokenHashes", 3)(docs.select(col("doc_id"), th.as("h")))
      time("lm: + shingle2", 3)(docs.select(col("doc_id"), K.shingleHashes2(th, P).as("b")))
      time("lm: + posexplode", 3)(docs.select(col("doc_id"),
        posexplode(K.shingleHashes2(th, P)).as(Seq("pos", "bh"))))
      time("lm: inst (with ph)", 3)(inst)
      time("lm: full", 3)(TextOps.bigramSurprisal(docs, "doc_id", "text"))
    }
    if (which("probe_pr")) {
      // decomposition of the pagerank floor: fixture-graph prep alone,
      // 1 round, 5 rounds — the (5r − 1r)/4 delta is the true per-round
      // cost; prep + scheduling is the rest
      def edges = {
        val e0 = TableIO.read(s, sfDir, "lineitem")
          .select((col("l_partkey") * 2).cast("long").as("src"),
            (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
          .distinct()
        e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      }
      time("pr: edge prep only", 3)(edges)
      time("pr: 1 round", 3)(graft.ext.Graph.pageRankFixed(edges, "src", "dst", iters = 1))
      time("pr: 3 rounds", 3)(graft.ext.Graph.pageRankFixed(edges, "src", "dst", iters = 3))
      time("pr: 5 rounds", 3)(graft.ext.Graph.pageRankFixed(edges, "src", "dst", iters = 5))
    }
    if (which("probe_diff")) {
      // diff_after_explode adjudication (the standing >2x-oracle row):
      // min-of-5 of the registered form vs its no-checkpoint variant —
      // the checkpoint IS the win (without it both DiffData sides
      // recompute the scan+explode), and the residual floor is the
      // eager materialization itself. Numbers recorded at the
      // registration site (DiffQueries.scala).
      time("diff_after_explode REG", 5)(SparkEntry.queries("diff_after_explode")(s, sfDir))
      def noCut: DataFrame = {
        val exploded = graft.ops.Transforms.explodeMap(
          TableIO.read(s, sfDir, "events")
            .withColumn("m", map(
              lit("etype"), col("event_type"),
              lit("kval"), get_json_object(col("props"), "$.k")))
            .select("event_id", "m"),
          graft.config.ExplodeMapConfig("m", "map_key", "map_value"))
        val target = exploded
          .filter(!(pmod(col("event_id"), lit(20)) === 0 && col("map_key") === "etype"))
          .withColumn("map_value",
            when(pmod(col("event_id"), lit(20)) === 1 && col("map_key") === "kval", lit("X"))
              .otherwise(col("map_value")))
        graft.jobs.DiffData.classify(exploded, target, Seq("event_id", "map_key"))
          .orderBy("event_id", "map_key")
      }
      time("diff_after_explode NOCUT", 5)(noCut)
    }
    if (which("probe_star")) {
      // star_join_revenue adjudication: the registered form leaves the
      // SF-scaling customer dim to AQE (broadcast at fixture scale,
      // shuffle join at 100x — a hard hint OOMs there); the A/B forces
      // broadcast(customer) to price what the no-hint posture costs at
      // THIS scale. Numbers recorded at the registration site
      // (AnalyticsQueries.scala).
      time("star_join REG (AQE)", 5)(SparkEntry.queries("star_join_revenue")(s, sfDir))
      def forced: DataFrame = {
        val li = TableIO.read(s, sfDir, "lineitem")
        val o = TableIO.read(s, sfDir, "orders")
        val c = TableIO.read(s, sfDir, "customer")
        val n = TableIO.read(s, sfDir, "nation")
        val r = TableIO.read(s, sfDir, "region")
        li.join(broadcast(o), li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(r("r_name"))
          .agg(
            count(lit(1)).as("n_items"),
            sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)"))
              .cast("double").as("revenue"))
          .orderBy("r_name")
      }
      time("star_join FORCED bcast", 5)(forced)
    }
    if (which("probe_sym") || which("probe_sym_r")) {
      // r15 adjudication: the driver's single contended pass showed the
      // symmetrized banded family 3-6x slower round-over-round while the
      // quiet-VM ScaleBench said +15% — min-of-5 at the registration
      // config, symmetric vs asymmetric, run in BOTH orders (probe_sym =
      // sym first, probe_sym_r = asym first) so warm-up lands on each
      // side once. Numbers recorded in BASELINE.md round-16 table.
      val emb = TableIO.read(s, sfDir, "embeddings")
      def graph(sym: Boolean) = graft.ext.Similarity.knnGraphBanded(
        emb, k = 4, bands = 12, bandPlanes = 5, probes = 2, symmetric = sym)
      def recall(sym: Boolean) = graft.ext.Similarity.knnRecallAuditBanded(
        emb, k = 4, bands = 12, bandPlanes = 5, probes = 2, symmetric = sym)
      def communities(sym: Boolean) = {
        val edges = graph(sym).filter(col("cos6") >= 0.15)
        graft.ext.Dedup.connectedComponentsStar(edges, "id_a", "id_b")
          .groupBy("cluster")
          .agg(count(lit(1)).as("n_members"), min("id").as("min_id"))
          .orderBy(col("n_members").desc, col("cluster"))
      }
      val order = if (which("probe_sym_r")) Seq(false, true) else Seq(true, false)
      for (symFlag <- order) {
        val tag = if (symFlag) "SYM " else "ASYM"
        time(s"knn_graph_banded $tag", 5)(graph(symFlag))
        time(s"knn_recall_banded $tag", 5)(recall(symFlag))
        time(s"knn_communities $tag", 5)(communities(symFlag))
      }
    }
    if (which("probe_postheap")) {
      // r16: WHERE should symmetrization happen? The registered pre-heap
      // form doubles the scored stream before the per-band 2k heaps
      // (exact wrt the both-orientations candidate set); NN-descent's
      // published form reverses neighbor LISTS — i.e. symmetrize the
      // per-band top-k SURVIVORS (slim N·k·bands rows), then merge.
      // Post-heap is an approximation of the pre-heap set (a reversed
      // pair only survives if it was top-k for its discoverer), so this
      // A/B measures BOTH the wall delta and the mutual-recall delta.
      import graft.ext.{Dedup, Similarity}
      val topk = org.apache.spark.sql.graft.plans.GroupTopK
      val emb = TableIO.read(s, sfDir, "embeddings")
      val (k, bands, planes, probes) = (4, 12, 5, 2)
      val ord = Seq(col("cos6").desc, col("vec_id").asc)
      def pairs = Similarity.bandPairs(emb, bands, planes, 10000L, probes)
      def mutualOf(d: DataFrame) = d.as("a")
        .join(d.as("b"), col("a.src") === col("b.dst") && col("a.dst") === col("b.src"))
        .filter(col("a.src") < col("a.dst"))
        .select(col("a.src").as("id_a"), col("a.dst").as("id_b"), col("a.cos6").as("cos6"))
      def preHeap = Similarity.knnDirectedBanded(emb, k, bands, planes,
        probes = probes, symmetric = true)
      def postHeap = {
        val fwd = topk.topkPerKey(pairs, Seq("query_id", "band"), ord, k)
        val rev = fwd.select(col("vec_id").as("query_id"), col("band"),
          col("query_id").as("vec_id"), col("cos6"))
        val merged = fwd.union(rev)
          .groupBy("query_id", "vec_id").agg(max("cos6").as("cos6"))
        topk.topkPerKey(merged, Seq("query_id"), ord, k)
          .select(col("query_id").as("src"), col("vec_id").as("dst"), col("cos6"))
      }
      def asym = Similarity.knnDirectedBanded(emb, k, bands, planes,
        probes = probes, symmetric = false)
      time("directed PRE-HEAP sym", 5)(preHeap)
      time("directed POST-HEAP sym", 5)(postHeap)
      time("directed ASYM", 5)(asym)
      for ((label, d) <- Seq("pre-heap" -> preHeap, "post-heap" -> postHeap,
          "asym" -> asym)) {
        val r = Similarity.mutualRecallAudit(emb, mutualOf(d), k).head()
        println(s"[ab] mutual recall $label: " +
          s"n_true=${r.getLong(0)} n_cand=${r.getLong(1)} n_hits=${r.getLong(2)} " +
          s"recall_ppm=${r.getLong(4)}")
      }
    }
    if (which("probe_counter")) {
      // counter_merge adjudication (r16 verdict: 1.01 s / 6.9× on the
      // contended driver box, first over the watch line, zero operator
      // change since round 8; oracle is a 0.15 s fixed floor). Min-of-5
      // of the registered form plus two strip-downs locating the second:
      // without the protocol's output sort, and with naive double
      // accumulation instead of exact DECIMAL. Verdict recorded at the
      // registration site (queries/DiffQueries.scala) and BASELINE.md.
      val li = TableIO.read(s, sfDir, "lineitem")
      time("counter_merge REG", 5)(
        SparkEntry.queries("counter_merge")(s, sfDir))
      time("counter_merge no-sort", 5)(
        graft.ops.Counters.mergeDeltas(li, Seq("l_orderkey"), "l_quantity"))
      time("counter_merge double-sum", 5)(
        li.groupBy("l_orderkey").agg(sum("l_quantity").as("counter_value")))
      // carve-out condition (b): the only plan knob a single hash-agg
      // has is the exchange width — if 8 vs 32 reducers moves the wall
      // <15 %, the residual is Spark's fixed per-query constant, not a
      // plan defect
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try time("counter_merge REG sp=8", 5)(
        SparkEntry.queries("counter_merge")(s, sfDir))
      finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }
    if (which("probe_pinc") || which("probe_pinc_r")) {
      // pipeline_incremental adjudication (r16 verdict: 2.04× boundary,
      // oscillating): the registered form localCheckpoints the three
      // multi-consumer ledger tables per execution — an in-memory
      // re-cache a production maintainer would NOT pay (its state lives
      // in tables; double-reads are two pruned parquet scans). A/B the
      // checkpoint against plain reloaded scans, min-of-5 each.
      import graft.ext.{PipelineIncremental, TextOps}
      val docs = TableIO.read(s, sfDir, "documents")
      val b = TextOps.GopherBounds(minWords = 20, maxWords = 80)
      val load = graft.run.StateStore.materialize(
        s, s"curation_${graft.run.StateStore.dirKey(sfDir)}",
        PipelineIncremental.toFrames(
          PipelineIncremental.curationState(
            docs.filter(col("doc_id") % 20 =!= 19),
            "doc_id", "text", "lang", "source", bounds = b)))
      val delta = docs.filter(col("doc_id") % 20 === 19)
      def run(pin: Boolean): DataFrame =
        PipelineIncremental.curationPipelineIncremental(
          PipelineIncremental.fromFrames {
            case n @ ("chunk_df" | "melted" | "shingles") if pin =>
              load(n).localCheckpoint(eager = false)
            case n => load(n)
          },
          delta, "doc_id", "text", "lang", "source", bounds = b)
      // both orders (probe_pinc = pin first, probe_pinc_r = plain first)
      // so JVM warm-up lands on each side once
      val arms = if (which("probe_pinc_r")) Seq(false, true) else Seq(true, false)
      arms.foreach { pin =>
        val tag = if (pin) "REG (pin 3)" else "plain scans"
        time(s"pipeline_incr $tag", 5)(run(pin))
      }
    }
    if (which("probe_recall")) {
      // r16 verdict #4: can knn_recall_banded's symmetric floor drop via
      // ANCHOR-RESTRICTED survivor derivation (survivors only for
      // anchors ∪ queries that probe an anchor's true bucket, instead of
      // the full symmetric graph)? First the bound itself is measured:
      // the fraction of (query, band) probe groups that hit an anchor
      // bucket. Structural expectation: VACUOUS — 5 % anchors nearly
      // cover the 2^bandPlanes buckets per band at fixture scale, and
      // under the committed plane-growth rule (buckets ≈ N/32) anchors
      // at 5 % OUTNUMBER buckets at every N, so the keep-set is ~all
      // queries and restriction only adds key-derivation work.
      import graft.ext.Similarity
      import org.apache.spark.sql.graft.FloatVectorDot
      val emb = TableIO.read(s, sfDir, "embeddings")
      val (k, bands, planes, probes, sampleMod) = (4, 12, 5, 2, 20L)
      val probed = emb.select(col("vec_id"),
          FloatVectorDot.lshBandProbes(col("embedding"), bands, planes, probes).as("__pbs"))
        .select(col("vec_id"), posexplode(col("__pbs")).as(Seq("band", "__pb")))
      val anchorKeys = probed.filter(col("vec_id") % sampleMod === 0)
        .select(col("band"), element_at(col("__pb"), 1).as("bucket")).distinct()
      val qb = probed.select(col("vec_id"), col("band"), explode(col("__pb")).as("bucket"))
      val kept = qb.join(anchorKeys, Seq("band", "bucket"))
        .select("vec_id", "band").distinct().count()
      val total = probed.select("vec_id", "band").distinct().count()
      println(s"[ab] anchor-restricted keep fraction: $kept/$total " +
        s"(${kept * 100 / math.max(total, 1)}%) of (query, band) groups")
      // the full registered audit vs the restricted derivation (the
      // audit's truth side is identical in both; only the candidate
      // graph derivation differs)
      time("knn_recall_banded REG", 5)(Similarity.knnRecallAuditBanded(
        emb, k = k, bands = bands, bandPlanes = planes, probes = probes, symmetric = true))
      def restricted: DataFrame = {
        // inline anchor-restricted bandPairs: same staged kernel pass,
        // query side semi-joined to (query, band) groups probing an
        // anchor true bucket (anchors keep all bands via their own hit)
        val staged = emb.select(col("vec_id"), col("embedding"),
            Similarity.norm(col("embedding")).as("nrm"),
            FloatVectorDot.lshBandProbes(col("embedding"), bands, planes, probes).as("__pbs"))
          .localCheckpoint(eager = false)
        val melted = staged.select(col("vec_id"), col("embedding"), col("nrm"),
            posexplode(col("__pbs")).as(Seq("band", "__pb")))
          .withColumn("bucket", element_at(col("__pb"), 1))
        val capped = graft.ext.HotKeys.dropOverCap(
          melted, Seq("band", "bucket"), 10000L, stage = false)
        val aKeys = capped.filter(col("vec_id") % sampleMod === 0)
          .select(col("band"), col("bucket")).distinct()
        val qryAll = capped.select(col("vec_id").as("query_id"),
          col("embedding").as("q_emb"), col("nrm").as("q_norm"),
          col("band"), explode(col("__pb")).as("bucket"))
        val qbKeep = qryAll.join(broadcast(aKeys), Seq("band", "bucket"))
          .select(col("query_id"), col("band")).distinct()
        val qry = qryAll.join(qbKeep, Seq("query_id", "band"), "left_semi")
        val idx = capped.select(col("vec_id"), col("embedding"),
          col("nrm").as("c_norm"), col("band"), col("bucket"))
        val pairs = qry.join(idx, Seq("band", "bucket"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("band"), col("vec_id"),
            round(Similarity.cosineFrom(
              Similarity.dot(col("q_emb"), col("embedding")),
              col("q_norm"), col("c_norm")), 6).as("cos6"))
        val cand = Similarity.directedFromSurvivors(
            Similarity.bandSurvivorsOf(pairs, k).localCheckpoint(eager = false), k)
          .filter(col("src") % sampleMod === 0)
          .select(col("src").as("query_id"), col("dst").as("neighbor_id"))
        // identical truth side to the registered audit
        val q = emb.filter(col("vec_id") % sampleMod === 0)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
            Similarity.norm(col("embedding")).as("q_norm"))
        val c = emb.withColumn("c_norm", Similarity.norm(col("embedding")))
        val tp = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
          .withColumn("cos6", round(Similarity.cosineFrom(
            Similarity.dot(col("q_emb"), col("embedding")),
            col("q_norm"), col("c_norm")), 6))
        val truth = Similarity.rankTopK(tp, k).select(col("query_id"), col("neighbor_id"))
        val hits = cand.join(truth, Seq("query_id", "neighbor_id"))
        truth.agg(count(lit(1)).as("n_true"))
          .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_candidates"))))
          .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hits"))))
          .select(col("n_true"), col("n_candidates"), col("n_hits"),
            expr("(n_hits * 1000000) div greatest(n_candidates, 1)").as("precision_ppm"),
            expr("(n_hits * 1000000) div greatest(n_true, 1)").as("recall_ppm"))
      }
      time("knn_recall_banded RESTRICTED", 5)(restricted)
      // equivalence: the restricted derivation must reproduce the
      // registered audit's row exactly (it is a pure execution strategy)
      val a = Similarity.knnRecallAuditBanded(
        emb, k = k, bands = bands, bandPlanes = planes, probes = probes,
        symmetric = true).collect()(0)
      val b2 = restricted.collect()(0)
      println(s"[ab] recall rows equal: ${a == b2}  reg=$a restricted=$b2")
    }
    if (which("probe_pwide")) {
      // r17: does the curation pipeline family ride the narrow-scan
      // kernel stage too? (documents.parquet is one row group — the
      // gopher/chunk/band/shingle kernels run in the scan's stage.)
      val docs = TableIO.read(s, sfDir, "documents")
      val b = graft.ext.TextOps.GopherBounds(minWords = 20, maxWords = 80)
      time("pipeline_e2e REG", 5)(graft.ext.Pipeline.curationPipeline(
        docs, "doc_id", "text", "lang", "source", bounds = b))
      time("pipeline_e2e WIDENED", 5)(graft.ext.Pipeline.curationPipeline(
        graft.ext.Similarity.widen(docs), "doc_id", "text", "lang", "source", bounds = b))
    }
    if (which("probe_argmin")) {
      // r18: the four `min(struct(dist, id))` argmin sites plan as
      // SortAggregate (struct buffers are not hash-aggregable) — partial
      // sort + exchange + final sort, no codegen hash path. Probe the
      // upside of a hash-aggregable argmin by packing (dist, id) into one
      // long: min(packed) is a plain codegen HashAggregate. The packed
      // decode reproduces the exact (dist, id) pair, so the variants are
      // bit-equal on the fixture (centroid ids < 8/16 by the registered
      // queries' contracts; the production fix is a DeclarativeAggregate
      // with a (dist, id) primitive buffer — no packing bound).
      import graft.ext.Similarity
      val emb = TableIO.read(s, sfDir, "embeddings")
      time("kmeans_assign REG", 5)(SparkEntry.queries("kmeans_assign")(s, sfDir))
      def assignPacked: DataFrame = {
        val c = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
          .withColumn("c_sq", Similarity.dot(col("c_emb"), col("c_emb")))
        emb.withColumn("v_sq", Similarity.dot(col("embedding"), col("embedding")))
          .crossJoin(broadcast(c))
          .withColumn("dist6", round(col("v_sq")
            - lit(2.0) * Similarity.dot(col("embedding"), col("c_emb")) + col("c_sq"), 6))
          .withColumn("__p", expr("cast(rint(dist6 * 1000000) as bigint) * 8 + c_id"))
          .groupBy("vec_id").agg(min("__p").as("p"))
          .select(col("vec_id"), expr("p % 8").as("centroid_id"),
            expr("cast(p div 8 as double) / 1000000.0").as("dist6"))
          .orderBy("vec_id")
      }
      time("kmeans_assign PACKED", 5)(assignPacked)
      time("kmeans_update REG", 5)(SparkEntry.queries("kmeans_update")(s, sfDir))
      def updatePacked: DataFrame = {
        val v = emb.select(col("vec_id"), Similarity.quantizeMicros(col("embedding")).as("q"))
        val c = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), Similarity.quantizeMicros(col("embedding")).as("cq"))
        val assigned = v.crossJoin(broadcast(c))
          .withColumn("dist_q",
            expr("aggregate(zip_with(q, cq, (x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), (acc, d) -> acc + d)"))
          .withColumn("__p", col("dist_q") * 8 + col("c_id"))
          .groupBy("vec_id").agg(min("__p").as("p"))
          .select(col("vec_id"), expr("p % 8").as("c_id"))
        v.join(assigned, "vec_id")
          .select(col("c_id"), posexplode(col("q")).as(Seq("dim", "vq")))
          .groupBy("c_id", "dim")
          .agg(count(lit(1)).as("n"), sum("vq").as("s"))
          .select(col("c_id").as("centroid_id"), col("dim").cast("long").as("dim"),
            expr("s div n").as("c_us"), col("n"))
          .orderBy("centroid_id", "dim")
      }
      time("kmeans_update PACKED", 5)(updatePacked)
      time("kmeans_next REG", 5)(SparkEntry.queries("kmeans_next_assign")(s, sfDir))
      def nextPacked: DataFrame = {
        val v = emb.select(col("vec_id"), Similarity.quantizeMicros(col("embedding")).as("q"))
        val c = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), Similarity.quantizeMicros(col("embedding")).as("cq"))
        val assigned = v.crossJoin(broadcast(c))
          .withColumn("dist_q",
            expr("aggregate(zip_with(q, cq, (x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), (acc, d) -> acc + d)"))
          .withColumn("__p", col("dist_q") * 8 + col("c_id"))
          .groupBy("vec_id").agg(min("__p").as("p"))
          .select(col("vec_id"), expr("p % 8").as("c_id"))
        val updated = v.join(assigned, "vec_id")
          .select(col("c_id"), posexplode(col("q")).as(Seq("dim", "vq")))
          .groupBy("c_id", "dim")
          .agg(count(lit(1)).as("n"), sum("vq").as("s"))
          .select(col("c_id").as("centroid_id"), col("dim").cast("long").as("dim"),
            expr("s div n").as("c_us"), col("n"))
        // array-form reassign: re-assemble the 8 updated centroids into
        // per-centroid arrays (512 rows -> 8), broadcast, one fused
        // zip_with distance per (vector, centroid) pair instead of the
        // N*64-row melt joined on dim (which fans to N*512 rows through
        // a two-level aggregate)
        val cArr = updated
          .groupBy("centroid_id")
          .agg(array_sort(collect_list(struct(col("dim"), col("c_us")))).as("ds"))
          .select(col("centroid_id"), expr("transform(ds, d -> d.c_us)").as("c_arr"))
        v.crossJoin(broadcast(cArr))
          .withColumn("dist_q",
            expr("aggregate(zip_with(q, c_arr, (x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), (acc, d) -> acc + d)"))
          .withColumn("__p", col("dist_q") * 8 + col("centroid_id"))
          .groupBy("vec_id").agg(min("__p").as("p"))
          .select(col("vec_id"), expr("p % 8").as("centroid_id"),
            expr("p div 8").as("dist_q"))
          .orderBy("vec_id")
      }
      time("kmeans_next PACKED", 5)(nextPacked)
      time("pq_codes REG", 5)(SparkEntry.queries("pq_codes")(s, sfDir))
      def pqPacked: DataFrame = {
        val cent = emb.filter(col("vec_id") < 16)
        val v = Similarity.pqSubVectors(Similarity.widen(emb), "vec_id")
        val c = Similarity.pqSubVectors(
            cent.select(col("vec_id").as("c_id"), col("embedding")), "c_id")
          .withColumnRenamed("svec", "cvec")
        v.join(broadcast(c), "sub")
          .withColumn("dist6", round(
            Similarity.dot(col("svec"), col("svec"))
              - lit(2.0) * Similarity.dot(col("svec"), col("cvec"))
              + Similarity.dot(col("cvec"), col("cvec")), 6))
          .withColumn("__p", expr("cast(rint(dist6 * 1000000) as bigint) * 16 + c_id"))
          .groupBy(col("vec_id"), col("sub"))
          .agg(min("__p").as("p"))
          .select(col("vec_id"), col("sub"), expr("p % 16").as("code"),
            expr("cast(p div 16 as double) / 1000000.0").as("dist6"))
          .orderBy("vec_id", "sub")
      }
      time("pq_codes PACKED", 5)(pqPacked)
      // equivalence smoke on the fixture (exact row sets)
      val regA = SparkEntry.queries("kmeans_assign")(s, sfDir)
      println("[ab] kmeans_assign equal: " +
        (regA.exceptAll(assignPacked).isEmpty && assignPacked.exceptAll(regA).isEmpty))
      val regN = SparkEntry.queries("kmeans_next_assign")(s, sfDir)
      println("[ab] kmeans_next equal: " +
        (regN.exceptAll(nextPacked).isEmpty && nextPacked.exceptAll(regN).isEmpty))
      val regP = SparkEntry.queries("pq_codes")(s, sfDir)
      println("[ab] pq_codes equal: " +
        (regP.exceptAll(pqPacked).isEmpty && pqPacked.exceptAll(regP).isEmpty))
    }
    if (which("probe_serve")) {
      // r18: ann_serve_e2e cell attachment — the OLD form re-joined the
      // PQ code table against candidates(vec_id, cell) to recover the
      // cell (corpus-sized broadcast; corpus×corpus join at scale); the
      // NEW form carries the cell through the encoding group key. Both
      // timed interleaved, min-of-5, plus row-set equality.
      import graft.ext.Similarity
      val emb = TableIO.read(s, sfDir, "embeddings")
      def oldForm: DataFrame = {
        val queries = emb.filter(col("vec_id") < 5)
        val candidates = emb
        val centroids = emb.filter(col("vec_id") < 16)
        val codes = Similarity.pqCodes(candidates, centroids)
          .join(candidates.select(col("vec_id"), col("label").as("__cell")), "vec_id")
          .select(col("vec_id"), col("sub"), col("code"), col("__cell"))
        val q = Similarity.pqSubVectors(
            queries.select(col("vec_id").as("query_id"), col("embedding")), "query_id")
          .withColumnRenamed("svec", "qvec")
        val c = Similarity.pqSubVectors(
            centroids.select(col("vec_id").as("c_id"), col("embedding")), "c_id")
          .withColumnRenamed("svec", "cvec")
        val lut = q.join(c, "sub")
          .withColumn("pdist_us", floor((
            Similarity.dot(col("qvec"), col("qvec"))
              - lit(2.0) * Similarity.dot(col("qvec"), col("cvec"))
              + Similarity.dot(col("cvec"), col("cvec"))) * lit(1000000.0)).cast("long"))
          .join(queries.select(col("vec_id").as("query_id"), col("label").as("__cell")),
            "query_id")
          .select(col("query_id"), col("sub"), col("c_id").as("code"),
            col("__cell"), col("pdist_us"))
        val pairs = codes.join(broadcast(lut), Seq("sub", "code", "__cell"))
          .filter(col("vec_id") =!= col("query_id"))
          .groupBy("query_id", "vec_id")
          .agg(sum("pdist_us").as("adc_us"))
        val short = pairs
          .withColumn("__sr", row_number().over(
            Window.partitionBy("query_id").orderBy(col("adc_us").asc, col("vec_id"))))
          .filter(col("__sr") <= 10)
          .select(col("query_id"), col("vec_id").as("neighbor_id"))
        val nv = Similarity.widen(candidates)
          .select(col("vec_id").as("neighbor_id"), col("embedding").as("__n_emb"))
        val qv = queries.select(col("vec_id").as("query_id"), col("embedding").as("__q_emb"))
        nv.join(broadcast(short), "neighbor_id")
          .join(broadcast(qv), "query_id")
          .withColumn("cos6", round(Similarity.cosine(col("__q_emb"), col("__n_emb")), 6))
          .withColumn("rank", row_number().over(
            Window.partitionBy("query_id").orderBy(col("cos6").desc, col("neighbor_id"))))
          .filter(col("rank") <= 3)
          .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos6"))
          .orderBy("query_id", "rank")
      }
      def newForm: DataFrame = SparkEntry.queries("ann_serve_e2e")(s, sfDir)
      for (i <- 1 to 2) {
        time(s"ann_serve OLD (join) #$i", 5)(oldForm)
        time(s"ann_serve NEW (carry) #$i", 5)(newForm)
      }
      println("[ab] ann_serve rows equal: " +
        (oldForm.exceptAll(newForm).isEmpty && newForm.exceptAll(oldForm).isEmpty))
    }
    if (which("probe_shj")) {
      // r18 config A/B (guide §9): preferSortMergeJoin=false lets the
      // planner pick shuffled-hash joins where its size gates hold (same
      // shuffle, no sort). Alternating passes over the SMJ-bearing
      // queries, pairwise min-of-4 — the last pass re-runs arm A to
      // expose box drift.
      val qs = Seq("knn_graph_mutual", "knn_graph_banded", "knn_banded_incremental",
        "knn_recall_mutual", "semantic_dedup", "nb_classify_confusion",
        "dedup_ngram_hot", "pipeline_e2e")
      for (pref <- Seq("true", "false", "true", "false")) {
        s.conf.set("spark.sql.join.preferSortMergeJoin", pref)
        qs.foreach(n => time(f"$n%-24s pSMJ=$pref", 4)(SparkEntry.queries(n)(s, sfDir)))
      }
      s.conf.unset("spark.sql.join.preferSortMergeJoin")
    }
    if (which("probe_pdecomp")) {
      // r18: where does pipeline_incremental's wall go? Decompose into
      // (a) census over the RELOADED state alone (no delta fold),
      // (b) the fold's survivor-stream frames only (kept2 + verified +
      // contaminated — what the census reads), (c) the full registered
      // query. All against the same persisted ledger the prepare hook
      // builds.
      import graft.ext.{PipelineIncremental, TextOps}
      val docs = TableIO.read(s, sfDir, "documents")
      val b = TextOps.GopherBounds(minWords = 20, maxWords = 80)
      val load = graft.run.StateStore.materialize(
        s, s"curation_${graft.run.StateStore.dirKey(sfDir)}",
        PipelineIncremental.toFrames(
          PipelineIncremental.curationState(
            docs.filter(col("doc_id") % 20 =!= 19),
            "doc_id", "text", "lang", "source", bounds = b)))
      val delta = docs.filter(col("doc_id") % 20 === 19)
      def st = PipelineIncremental.fromFrames(load)
      time("pinc census(state) only", 5)(
        PipelineIncremental.censusFromState(st, "doc_id", "lang"))
      def folded = PipelineIncremental.curationStateIncremental(
        st, delta, "doc_id", "text", "lang", "source", bounds = b)
      time("pinc fold.kept2 only", 5)(folded.kept2)
      time("pinc fold.verified only", 5)(folded.verifiedTagged)
      time("pinc fold.contaminated", 5)(folded.contaminated)
      time("pinc FULL REG", 5)(SparkEntry.queries("pipeline_incremental")(s, sfDir))
    }
    if (which("probe_pfoot")) {
      // r18: decompose the delta-footprint prefix of the fold — which of
      // the sequential stages carries the ~5 s wall.
      import graft.ext.{Dedup, PipelineIncremental, TextOps}
      val docs = TableIO.read(s, sfDir, "documents")
      val b = TextOps.GopherBounds(minWords = 20, maxWords = 80)
      val load = graft.run.StateStore.materialize(
        s, s"curation_${graft.run.StateStore.dirKey(sfDir)}",
        PipelineIncremental.toFrames(
          PipelineIncremental.curationState(
            docs.filter(col("doc_id") % 20 =!= 19),
            "doc_id", "text", "lang", "source", bounds = b)))
      val delta = docs.filter(col("doc_id") % 20 === 19)
      val st = PipelineIncremental.fromFrames(load)
      def deltaTrain = delta.filter(col("source") =!= "src0")
        .select(col("doc_id"), col("text"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_raw_tokens"))
      def k1d = deltaTrain
        .join(TextOps.gopherRules(deltaTrain, "doc_id", "text",
            Seq("the", "a", "of", "and", "to", "in", "is", "on"), b)
          .filter(col("passes")).select(col("doc_id")), Seq("doc_id"))
      time("pfoot deltaTrain", 4)(deltaTrain)
      time("pfoot k1d (gopher)", 4)(k1d)
      // the full delta footprint (stage-1/2 delta curation, T2, changed
      // band keys, touched buckets) + four tiny count aggregates
      time("pfoot regimeAudit=footprint", 4)(PipelineIncremental.deltaRegimeAudit(
        st, delta, "doc_id", "text", "lang", "source", bounds = b))
    }
    if (which("probe_pjobs")) {
      // r19: where does pipeline_incremental's driver time go? Hypothesis:
      // every .localCheckpoint(eager=false) on a multi-exchange plan
      // BLOCKS at construction — AdaptiveSparkPlanExec.doExecute()
      // materializes all non-result query stages before returning the
      // RDD — so the fold's ~26 checkpoints run their shuffles
      // sequentially during curationStateIncremental() itself, and even
      // frames the census never reads pay their exchanges. Measure
      // construction wall vs census-action wall, and count jobs.
      import graft.ext.{PipelineIncremental, TextOps}
      val docs = TableIO.read(s, sfDir, "documents")
      val b = TextOps.GopherBounds(minWords = 20, maxWords = 80)
      val load = graft.run.StateStore.materialize(
        s, s"curation_${graft.run.StateStore.dirKey(sfDir)}",
        PipelineIncremental.toFrames(
          PipelineIncremental.curationState(
            docs.filter(col("doc_id") % 20 =!= 19),
            "doc_id", "text", "lang", "source", bounds = b)))
      val delta = docs.filter(col("doc_id") % 20 === 19)
      val st = PipelineIncremental.fromFrames(load)
      val nJobs = new java.util.concurrent.atomic.AtomicInteger
      val counter = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          nJobs.incrementAndGet(); ()
        }
      }
      s.sparkContext.addSparkListener(counter)
      for (i <- 1 to 3) {
        nJobs.set(0)
        val t0 = System.nanoTime()
        val folded = PipelineIncremental.curationStateIncremental(
          st, delta, "doc_id", "text", "lang", "source", bounds = b)
        val t1 = System.nanoTime()
        val jc = nJobs.get
        PipelineIncremental.censusFromState(folded, "doc_id", "lang")
          .write.mode("overwrite").format("noop").save()
        val t2 = System.nanoTime()
        Thread.sleep(200) // let the listener bus drain
        println(f"[ab] pjobs#$i construct=${(t1 - t0) / 1e9}%.3f s " +
          f"(jobs=$jc) censusAction=${(t2 - t1) / 1e9}%.3f s " +
          f"(jobs=${nJobs.get - jc})")
      }
      s.sparkContext.removeSparkListener(counter)
    }
    if (which("probe_shj2")) {
      // does preferSortMergeJoin=false actually change the AQE-final
      // plan of the probe_shj queries, or was the measured delta order
      // bias? Execute each under both values and print the join nodes.
      for (q <- Seq("knn_graph_mutual", "semantic_dedup", "nb_classify_confusion");
           pref <- Seq("true", "false")) {
        s.conf.set("spark.sql.join.preferSortMergeJoin", pref)
        val df = SparkEntry.queries(q)(s, sfDir)
        df.write.mode("overwrite").format("noop").save()
        val p = df.queryExecution.executedPlan.toString
        val smj = "SortMergeJoin".r.findAllIn(p).length
        val shj = "ShuffledHashJoin".r.findAllIn(p).length
        val bhj = "BroadcastHashJoin".r.findAllIn(p).length
        println(s"[ab] $q pSMJ=$pref: SMJ=$smj SHJ=$shj BHJ=$bhj")
      }
      s.conf.unset("spark.sql.join.preferSortMergeJoin")
      // and a blind repeated timing of one query under ALTERNATING conf,
      // 8 samples each interleaved, to kill order bias
      val ts = scala.collection.mutable.Map("true" -> Vector.empty[Double],
        "false" -> Vector.empty[Double])
      for (i <- 1 to 8; pref <- Seq("true", "false")) {
        s.conf.set("spark.sql.join.preferSortMergeJoin", pref)
        val t0 = System.nanoTime()
        SparkEntry.queries("knn_graph_mutual")(s, sfDir)
          .write.mode("overwrite").format("noop").save()
        ts(pref) :+= (System.nanoTime() - t0) / 1e9
      }
      ts.foreach { case (k, v) =>
        println(f"[ab] knn_graph_mutual interleaved pSMJ=$k min=${v.min}%.3f " +
          s"all=${v.map(x => f"$x%.2f").mkString(",")}")
      }
    }
    // any arg that names a registered query: time it directly (regression
    // triage without authoring a bespoke block per query)
    which.filter(SparkEntry.queries.contains).toSeq.sorted.foreach { name =>
      time(name, 4)(SparkEntry.queries(name)(s, sfDir))
    }
    spark.stop()
  }
}
