package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight, BuildSide}

/** The NARROW-STAGE INVARIANT, as a named spec (r17 verdict #2): every
 * broadcast-joined kernel stage in the embedding family must run at
 * ≥ session parallelism. A broadcast join runs in its STREAM side's
 * stage — no exchange, so AQE cannot split it — and a fixture/small
 * scan arrives in 1–2 partitions (single parquet row-group), which
 * single-threads the entire pair scoring / ADC / shortlist / melt work.
 * The disease was fixed twice in r17 through different doors
 * (Similarity.widen for plain scans; the gated LEFT SEMI in
 * affectedForwardPairs for the join-side inheritance); this spec makes
 * door number three fail a test instead of a bench archaeology.
 *
 * The audit is STATIC: it walks the query's physical plan without
 * executing it (materializing subtrees of an unprepared adaptive plan
 * forces broadcast builds and crashes on missing columnar transitions),
 * so widths are the planner's — exchanges report their static partition
 * count, scans their file-split count. AQE can only COALESCE an
 * exchange below that count when the data is tiny, which is exactly
 * when parallelism stops mattering; it never splits a narrow scan, so
 * static widths are the faithful ceiling for this invariant.
 *
 * Two deliberate scopes:
 *  - Embedding family only: text-side kernel pipelines measured FASTER
 *    unwidened (BenchAB probe_pwide — widening shuffles the text bytes
 *    themselves), so text queries are not listed.
 *  - Tiny-by-design streams are exempt: every ANN query's anchor side
 *    is a `vec_id < k` slice (k ≤ 16) whose comparison pushes into the
 *    scan, so a scan-rooted stream carrying a pushed LessThan/LessThanOrEqual
 *    /EqualTo on the PK is a deliberate slice (LUT builds, query prep),
 *    not an inherited corpus scan. Corpus frames never qualify — even
 *    the incremental %-split base/delta can't (modulo is not pushable),
 *    so a genuine corpus stream cannot accidentally exempt itself.
 */
class NarrowStageSpec extends SparkSpec {

  /** Unwrap AQE/codegen wrappers down to the node itself. */
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
    case q: QueryStageExec => unwrap(q.plan)
    case r: ReusedExchangeExec => unwrap(r.child)
    case w: org.apache.spark.sql.execution.WholeStageCodegenExec => unwrap(w.child)
    case i: org.apache.spark.sql.execution.InputAdapter => unwrap(i.child)
    case other => other
  }

  private def streamedOf(b: SparkPlan, side: BuildSide): SparkPlan = side match {
    case BuildLeft => b.children(1)
    case BuildRight => b.children.head
  }

  /** Every broadcast join in the plan, with its streamed side — the side
   * whose stage the join body runs in. */
  private def broadcastJoins(p: SparkPlan): Seq[(String, SparkPlan)] = {
    val u = unwrap(p)
    val here = u match {
      case b: BroadcastHashJoinExec => Seq((b.nodeName, streamedOf(b, b.buildSide)))
      case b: BroadcastNestedLoopJoinExec => Seq((b.nodeName, streamedOf(b, b.buildSide)))
      case _ => Seq.empty
    }
    here ++ u.children.flatMap(broadcastJoins)
  }

  /** STATIC partition count of a plan subtree. Never builds an RDD of a
   * shuffle/broadcast subtree (ShuffleExchangeExec.numPartitions forces
   * the shuffle dependency, which materializes child broadcasts);
   * exchanges report outputPartitioning, scans their FileScanRDD split
   * count (driver-only), RDD leaves their real count. An unknown
   * leaf/partition-changing node fails loudly so a future plan shape
   * teaches the spec instead of slipping past it. */
  private def width(p: SparkPlan): Int = unwrap(p) match {
    case f: org.apache.spark.sql.execution.FileSourceScanExec =>
      f.inputRDD.getNumPartitions
    case r: org.apache.spark.sql.execution.RDDScanExec => r.rdd.getNumPartitions
    case _: org.apache.spark.sql.execution.LocalTableScanExec => 1
    case s: ShuffleQueryStageExec => s.shuffle.outputPartitioning.numPartitions
    case a: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec =>
      a.partitionSpecs.length
    case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
      e.outputPartitioning.numPartitions
    case u: org.apache.spark.sql.execution.UnionExec => u.children.map(width).sum
    case c: org.apache.spark.sql.execution.CoalesceExec => c.numPartitions
    case b: BroadcastHashJoinExec => width(streamedOf(b, b.buildSide))
    case b: BroadcastNestedLoopJoinExec => width(streamedOf(b, b.buildSide))
    case n if n.children.size == 1 => width(n.children.head)
    case other => fail(s"width(): unhandled node ${other.nodeName} — teach the spec")
  }

  /** Is this stream a DELIBERATE tiny slice (anchor/query side)? True
   * iff it is scan-rooted (no exchange below the join) and the scan
   * carries a pushed comparison filter — the `vec_id < k` anchor
   * pattern. Exchange-rooted streams and unfiltered corpus scans are
   * never exempt. */
  private def deliberateSlice(p: SparkPlan): Boolean = {
    val scans = p.collectLeaves().map(unwrap).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    def sliced(f: org.apache.spark.sql.execution.FileSourceScanExec): Boolean =
      f.metadata.get("PushedFilters").exists(s =>
        s.contains("LessThan") || s.contains("GreaterThan") || s.contains("EqualTo"))
    // no exchange between scan and join: the subtree's width IS a scan's
    val scanRooted = {
      def hasExchange(q: SparkPlan): Boolean = unwrap(q) match {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => true
        case _: ShuffleQueryStageExec => true
        case n => n.children.exists(hasExchange)
      }
      !hasExchange(p)
    }
    scanRooted && scans.nonEmpty && scans.forall(sliced)
  }

  private def violations(df: DataFrame): (Seq[(String, Int)], Int) = {
    val want = spark.sparkContext.defaultParallelism
    val joins = broadcastJoins(df.queryExecution.executedPlan)
    val bad = joins.collect {
      case (name, streamed) if !deliberateSlice(streamed) && width(streamed) < want =>
        val leaves = streamed.collectLeaves().map(l => unwrap(l).nodeName).distinct
        (s"$name<-${leaves.mkString("+")}", width(streamed))
    }
    (bad, joins.size)
  }

  // The kernel-stage query shapes the r17 verdict names, plus the serving
  // compositions built from them. Shapes whose pair stage is a SHUFFLE
  // join (banded family) have post-exchange parallelism by construction
  // and may report zero broadcast joins — the audit still covers any
  // broadcast stage they do plan (the r17 semi-join door).
  private val kernelQueries = Seq(
    "topk_cosine",            // brute-force pair scoring (BNLJ stream)
    "topk_cosine_ivf",        // cell-blocked pair scoring
    "topk_cosine_lsh",        // bucketed pair scoring
    "topk_cosine_lsh_probe",  // multi-probe pair scoring
    "topk_cosine_sq8",        // SQ8 int-dot shortlist + exact re-rank
    "pq_adc_topk",            // ADC LUT scan
    "pq_rerank_topk",         // two-stage re-rank
    "ann_serve_e2e",          // IVF-PQ serving composition
    "ann_serve_sq8",          // SQ8 cell-routed serving
    "knn_graph_banded",       // banded pair scoring (shuffle join)
    "knn_banded_incremental", // incremental melt + affected semi-join
    "semantic_dedup")         // SemDeDup centroid-cell pair scoring

  // These shapes MUST plan at least one broadcast join — a zero count
  // means the walk (or the plan) changed shape and the audit went blind.
  private val broadcastByConstruction = Set(
    "topk_cosine", "topk_cosine_ivf", "topk_cosine_lsh", "topk_cosine_lsh_probe",
    "topk_cosine_sq8", "pq_adc_topk", "pq_rerank_topk", "ann_serve_e2e",
    "ann_serve_sq8", "semantic_dedup")

  for (q <- kernelQueries)
    test(s"$q: every broadcast-joined kernel stage runs at >= session parallelism") {
      val want = spark.sparkContext.defaultParallelism
      val (bad, n) = violations(SparkEntry.queries(q)(spark, Sf))
      if (broadcastByConstruction(q))
        assert(n > 0, s"$q: expected at least one broadcast join in the plan")
      assert(bad.isEmpty,
        s"$q: broadcast-joined stage(s) inherited a narrow scan " +
          s"(${bad.map { case (s, w) => s"$s=$w" }.mkString(", ")} < $want) — " +
          "the kernel work would single-thread; widen the stream-side frame")
    }
}
