package org.apache.spark.sql.graft.plans

import scala.collection.mutable

import org.apache.spark.SparkEnv
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.util.collection.unsafe.sort.PrefixComparators

/**
 * Whole-operator Catalyst extension (SURVEY.md §2 preference tier (c):
 * custom `LogicalPlan` + `Rule[LogicalPlan]` + `SparkStrategy` +
 * `SparkPlan`, registered via `SparkSessionExtensions`): GROUP-WISE
 * TOP-K as a native operator.
 *
 * Why an operator and not the window composition (Curation.topkPerGroup):
 * the window form SORTS every (group, partition) slice and materializes
 * window frames; this operator keeps a bounded k-row heap per group and
 * streams — per-partition memory O(groups·k), per-row cost O(log k), no
 * sort buffers. The plan is the canonical partial/final pair: a PARTIAL
 * exec bounds every input partition to ≤ k rows per group BEFORE the
 * exchange (the map-side-combine shape), then a FINAL exec re-selects
 * after clustering on the keys — at 100 TB the shuffle carries k rows
 * per (group, input-partition), never the group's full population.
 *
 * `order` must extend to a total order (end it with a unique column) or
 * survivor selection between order-ties is input-order dependent — the
 * same contract as Curation.topkPerGroup and Dedup.exactKeep.
 */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/**
 * Optimizer rule: a Filter whose predicate only references the GROUPING
 * keys commutes with per-group top-k (it keeps or drops whole groups),
 * so push it below the operator where it can continue toward the scan.
 * Spark's own PushPredicateThroughNonJoin does not know this node — the
 * rule is what makes `topk.filter(key = …)` prune at the source.
 */
object PushFilterThroughTopK extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // keys must be BARE attributes for the subset test to be sound: with
    // a derived key like substring(lang, 1, 2), a predicate on `lang`
    // references only key inputs yet is NOT a function of the key value —
    // pushing it would change which rows compete within a group
    case Filter(cond, t: TopKPerKey)
        if t.keys.forall(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Attribute]) &&
          cond.references.subsetOf(AttributeSet(t.keys)) &&
          cond.deterministic =>
      t.copy(child = Filter(cond, t.child))
  }
}

/** Plans the logical node as the partial/final exec pair; EnsureRequirements
 * inserts the key-clustered exchange between them. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/**
 * Bounded-heap group-wise top-k. A max-heap of size ≤ k per group key
 * (head = worst row in the requested order); a new row replaces the head
 * only if it sorts strictly before it. Output within each group is
 * emitted in the requested order (ascending dequeue) so downstream
 * consumers see deterministic intra-group order.
 */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    partial: Boolean, child: SparkPlan) extends SparkPlan with UnaryExecNode {

  override def output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] = child.output
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(keys))
  override def nodeName: String = if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val isPartial = partial
    // read once on the driver at execute time, so a test/session can size
    // the guards; tasks see the captured values
    val conf = org.apache.spark.sql.internal.SQLConf.get
    val groupCap = conf
      .getConfString("spark.graft.topk.partialGroupCap", TopKPerKeyExec.PartialGroupCap.toString)
      .toInt
    val finalCap = conf
      .getConfString("spark.graft.topk.finalGroupCap", TopKPerKeyExec.FinalGroupCap.toString)
      .toInt
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      // LinkedHashMap: emission order follows first-seen key order — a
      // deterministic function of the (clustered) input, not hash order
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      def absorb(heap: mutable.PriorityQueue[InternalRow], row: InternalRow): Unit =
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      // Surface the heap map's retained bytes as peakExecutionMemory at
      // drain time (when it is maximal, before the destructive dequeue):
      // the map lives on the JVM heap outside Spark's memory manager, so
      // without this the operator's footprint is invisible to task
      // metrics and the scale harness reads 0 for its stress runs.
      // Observability only — boundedness comes from the group caps and
      // the sort degrade below.
      def reportPeak(): Unit = {
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) {
          var bytes = 0L
          heaps.foreach { case (key, h) =>
            bytes += key.getSizeInBytes + 40 // map entry + queue overhead
            h.foreach {
              case u: UnsafeRow => bytes += u.getSizeInBytes + 16
              case _ => bytes += 64
            }
          }
          tc.taskMetrics().incPeakExecutionMemory(bytes)
        }
      }
      def drained: Iterator[InternalRow] = {
        reportPeak()
        heaps.valuesIterator.flatMap(h => h.dequeueAll.reverseIterator)
      }
      if (isPartial) {
        // Memory guard for the partial pass: with near-unique keys the
        // group map would retain ~the whole input partition on the JVM
        // heap. The partial exec is only an optimization — any row it
        // passes through untrimmed is re-trimmed by the final exec after
        // the shuffle — so once the map holds `PartialGroupCap` groups,
        // rows of NEW keys stream straight through instead of opening
        // another heap. Memory is bounded at O(cap · k) while dominant
        // keys (the ones partial trimming exists for) still collapse
        // map-side.
        val passAndAbsorb: Iterator[InternalRow] = iter.flatMap { row =>
          val key = keyProj(row)
          heaps.get(key) match {
            case Some(heap) =>
              absorb(heap, row); Iterator.empty
            case None if heaps.size < groupCap =>
              val h = mutable.PriorityQueue.empty[InternalRow](ord)
              heaps.put(key.copy(), h)
              h.enqueue(row.copy())
              Iterator.empty
            case None =>
              Iterator.single(row) // cap reached: pass through, final re-trims
          }
        }
        passAndAbsorb ++ drained
      } else {
        // FINAL pass: must produce exact results, so rows can never pass
        // through — instead, when the partition holds more than
        // `FinalGroupCap` distinct groups the heap map stops scaling with
        // cardinality and the partition DEGRADES to the sort formulation:
        // everything accumulated so far plus the rest of the input goes
        // through a spill-safe external sort on (keys, order), and the
        // first k rows per key group are streamed off the sorted run.
        // Same answer, O(k) emit memory, disk instead of OOM — the heap
        // path stays the fast path for every partition under the cap.
        var overflow: InternalRow = null
        while (iter.hasNext && (overflow eq null)) {
          val row = iter.next()
          val key = keyProj(row)
          heaps.get(key) match {
            case Some(heap) => absorb(heap, row)
            case None if heaps.size < finalCap =>
              val h = mutable.PriorityQueue.empty[InternalRow](ord)
              heaps.put(key.copy(), h)
              h.enqueue(row.copy())
            case None => overflow = row.copy()
          }
        }
        if (overflow eq null) drained
        else {
          reportPeak() // the accumulated map is handed to the sorter below
          TopKPerKeyExec.sortedTopK(childOutput, keyExprs, sortOrder, limit,
            heaps.valuesIterator.flatMap(_.iterator) ++ Iterator.single(overflow) ++ iter)
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** Default max groups the PARTIAL exec holds per task before passing
   * new keys through untrimmed (override:
   * `spark.graft.topk.partialGroupCap`): 64k groups × k rows bounds the
   * heap regardless of key cardinality, while any realistic hot-key
   * distribution still collapses map-side. */
  val PartialGroupCap: Int = 1 << 16

  /** Default max groups the FINAL exec holds per task before degrading
   * the partition to the spill-safe sorted formulation (override:
   * `spark.graft.topk.finalGroupCap`). 1M groups × k row copies is the
   * knee where an in-heap group map starts competing with executor
   * memory; past it, sorting (which spills) is the plan a window/sort
   * formulation would have run anyway. */
  val FinalGroupCap: Int = 1 << 20

  /** Exact group-wise top-k via external sort: order by (keys, order),
   * then stream the first k rows of each key group off the sorted run.
   * UnsafeExternalRowSorter spills to disk under memory pressure, so this
   * path is safe at any group cardinality. Constant sort prefixes (radix
   * off) push all comparisons to the row ordering — the keys have no
   * generic prefix, and this path is the degraded one where correctness,
   * not the last 20% of sort throughput, is the point. */
  private[plans] def sortedTopK(
      childOutput: Seq[Attribute],
      keyExprs: Seq[Expression],
      order: Seq[SortOrder],
      limit: Int,
      rows: Iterator[InternalRow]): Iterator[InternalRow] = {
    val schema = DataTypeUtils.fromAttributes(childOutput)
    val ordering =
      RowOrdering.create(keyExprs.map(SortOrder(_, Ascending)) ++ order, childOutput)
    val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
      private val zero = new UnsafeExternalRowSorter.PrefixComputer.Prefix
      override def computePrefix(row: InternalRow): UnsafeExternalRowSorter.PrefixComputer.Prefix = {
        zero.value = 0L; zero.isNull = false; zero
      }
    }
    val sorter = UnsafeExternalRowSorter.create(
      schema, ordering, PrefixComparators.LONG, prefixComputer,
      SparkEnv.get.memoryManager.pageSizeBytes, false)
    val toUnsafe = UnsafeProjection.create(childOutput.map(_.dataType).toArray)
    val sorted = sorter.sort(rows.map {
      case u: UnsafeRow => u
      case r => toUnsafe(r)
    })
    val keyProj = UnsafeProjection.create(keyExprs, childOutput)
    var currentKey: UnsafeRow = null
    var emitted = 0
    sorted.flatMap { row =>
      val key = keyProj(row)
      if ((currentKey eq null) || key != currentKey) {
        currentKey = key.copy()
        emitted = 1
      } else emitted += 1
      if (emitted <= limit) Iterator.single(row) else Iterator.empty
    }
  }
}

/** Canonical registration path: `spark.sql.extensions=…GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => PushFilterThroughTopK)
  }
}

object GroupTopK {

  /** Idempotent in-session registration (for sessions built without the
   * `spark.sql.extensions` config — e.g. a host harness's own session).
   * ExperimentalMethods is additive per-session state, not a global. */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughTopK)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughTopK
    }
  }

  /** Group-wise top-k through the native operator. `orderCols` may carry
   * `.asc`/`.desc`; bare columns default ascending. End the order with a
   * unique tiebreak for deterministic survivors. */
  def topkPerKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // empty keys would reach Spark's ClusteredDistribution(Nil) require
    // deep inside EnsureRequirements — fail here with the actual fix
    require(keyCols.nonEmpty,
      "topkPerKey needs at least one key column — for a global top-k use orderBy(...).limit(k)")
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    ensureRegistered(spark)
    // session converter, NOT ExpressionUtils.expression: the latter wraps
    // the column's internal node lazily (non-serializable past the
    // analyzer); the converter produces the real catalyst expression,
    // unwrapping `.desc`/`.asc` to a catalyst SortOrder
    val keys: Seq[Expression] = keyCols.map(c => spark.expression(df(c)))
    val order: Seq[SortOrder] = orderCols.map(c => spark.expression(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    Dataset.ofRows(spark, TopKPerKey(keys, order, k, df.queryExecution.analyzed))
  }
}
