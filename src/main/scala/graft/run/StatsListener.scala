package graft.run

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/**
 * Live job-progress counters — the Spark-native form of the reference's
 * periodic stats printing (`spark.cdm.perfops.printStatsAfter` /
 * `.printStatsPerPart`; `[upstream]` `job/JobCounter.java` prints
 * read/write counts every N rows). Rather than threading counters
 * through operator code (upstream's approach — invasive and easy to
 * miss a path), a `SparkListener` taps the task-metrics stream the
 * engine already emits: every operator, past and future, is covered for
 * free, with zero cost on the data path.
 *
 * Executor-side metrics arrive with task-end events, so totals are
 * eventually consistent while a stage runs — the same semantics as
 * upstream's periodic print. At 100 TB this is also the spill/shuffle
 * early-warning channel: `memorySpilled` climbing during a migrate means
 * partitions outgrew executor memory and `numParts` needs raising.
 */
final class StatsListener extends SparkListener {
  private val records = new AtomicLong
  private val written = new AtomicLong
  private val shuffleRead = new AtomicLong
  private val shuffleWritten = new AtomicLong
  private val spilled = new AtomicLong
  private val tasks = new AtomicLong

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      tasks.incrementAndGet()
      records.addAndGet(m.inputMetrics.recordsRead)
      written.addAndGet(m.outputMetrics.recordsWritten)
      shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shuffleWritten.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      spilled.addAndGet(m.memoryBytesSpilled)
    }
  }

  /** Point-in-time counter snapshot (the upstream print line's fields). */
  def snapshot: Map[String, Long] = Map(
    "tasks" -> tasks.get(),
    "recordsRead" -> records.get(),
    "recordsWritten" -> written.get(),
    "shuffleBytesRead" -> shuffleRead.get(),
    "shuffleBytesWritten" -> shuffleWritten.get(),
    "memorySpilled" -> spilled.get())
}

object StatsListener {
  /** Attach a fresh listener to the session; caller detaches via
   * [[detach]] when the job ends (listeners outlive jobs otherwise). */
  def attach(spark: SparkSession): StatsListener = {
    val l = new StatsListener
    spark.sparkContext.addSparkListener(l)
    l
  }

  def detach(spark: SparkSession, l: StatsListener): Unit =
    spark.sparkContext.removeSparkListener(l)
}
