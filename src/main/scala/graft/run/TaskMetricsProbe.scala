package org.apache.spark.sql.graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/**
 * Task-metric aggregator for the scale harness: sums shuffle read/write
 * bytes, spill bytes, and input bytes, and tracks the max per-task peak
 * execution memory, across every task that ends between `reset()` calls.
 *
 * Wall-time curves alone can hide a shuffle explosion at small scale (a
 * 10× shuffle-volume jump that still fits in page cache costs near-zero
 * seconds locally but saturates the network fabric on a real cluster) —
 * the shuffle-byte curve is the direct evidence the 100 TB posture needs.
 *
 * Lives under `org.apache.spark.sql.graft` because completeness needs
 * `listenerBus.waitUntilEmpty` (private[spark]): listener delivery is
 * async, so a read without a drain undercounts the tail of the job.
 * Single-writer usage (the scale harness runs one family at a time);
 * the atomics are for the listener-thread/main-thread handoff.
 */
final class TaskMetricsProbe extends SparkListener {
  val shuffleReadB = new AtomicLong
  val shuffleWriteB = new AtomicLong
  val spilledB = new AtomicLong
  val inputB = new AtomicLong
  val peakTaskExecB = new AtomicLong
  /** Summed task CPU time (ns). The load-bearing scale metric on a
   * shared VM: vmstat showed 20-44% hypervisor steal during harness
   * runs, which inflates WALL time 2-20× run-to-run, while CPU time
   * counts only cycles actually executed — steal-immune, and the honest
   * "total work" figure a linear-scaling claim is about. */
  val cpuTimeNs = new AtomicLong

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      shuffleReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shuffleWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      spilledB.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      inputB.addAndGet(m.inputMetrics.bytesRead)
      peakTaskExecB.updateAndGet(p => math.max(p, m.peakExecutionMemory))
      cpuTimeNs.addAndGet(m.executorCpuTime)
    }
  }

  def reset(): Unit = {
    shuffleReadB.set(0); shuffleWriteB.set(0); spilledB.set(0)
    inputB.set(0); peakTaskExecB.set(0); cpuTimeNs.set(0)
  }

  /** Block until every pending listener event is delivered, so the
   * counters cover the whole job that just finished. */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty(60000L)
}
