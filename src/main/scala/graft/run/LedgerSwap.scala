package graft.run

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The shared ledger-swap transaction of the streaming state maintainers
 * ([[StreamingCuration]], [[StreamingKnn]]): exactly-once STATE on top of
 * `foreachBatch`'s at-least-once delivery, by composition of
 *
 *  - an applied-batch WATERMARK (`_batch`) stored INSIDE the swapped
 *    directory — exactly as durable as the frames it describes; a
 *    replayed batch (id ≤ watermark) is skipped whole, which is the
 *    correct dedup granularity for NON-idempotent folds;
 *  - an atomic directory swap: frames are written to `<dir>.__staging`,
 *    sealed with a `_complete` marker only after every frame (and the
 *    watermark) is durable, then renamed over the live directory — all
 *    frames move together, a partial swap is never observable.
 *
 * Crash windows (the [[StreamingMigrate]] recovery proof, restated).
 * The swap is rename(live → __old) + rename(staging → live) +
 * delete(__old) — the live ledger is only ever MOVED atomically, never
 * deleted in place, so no window leaves it partially present:
 * unsealed staging → discard + replay re-folds; sealed staging with a
 * live ledger (crash before the live dir was moved aside) → discard +
 * replay re-folds against the intact ledger; sealed staging without a
 * live ledger (crash between the two renames) → staging IS the state,
 * recovery finishes the rename and the replay is skipped by its own
 * watermark; crash after the swap (mid- or pre-delete of `__old`) →
 * replay skipped by the watermark, recovery sweeps the leftover.
 *
 * RETENTION CONTRACT: a ledger needs no compaction or vacuum job. Each
 * [[commit]] REPLACES the whole directory — the only on-disk artifacts
 * are the live frames plus the `_batch`/`_complete` markers, and the
 * transient `__staging`/`__old` siblings exist only inside one commit
 * (or until the next `recover()` after a crash). A maintainer folding
 * forever therefore holds exactly one ledger's worth of files: entry
 * count is O(frames) and bytes are O(current state) regardless of how
 * many batches have been applied — there are no generations, no
 * tombstones, no append logs to trim. (Pinned by LedgerSwapSpec's
 * 50-commit retention test.) The trade is that each commit rewrites the
 * full ledger — corpus-linear, as documented at the maintainers; a
 * deployment that moves the big frames to append+merge tables
 * (Iceberg/Delta) takes on that format's own compaction story in
 * exchange.
 */
private[run] object LedgerSwap {

  private val Complete = "_complete"
  private val BatchFile = "_batch"

  /** CONCURRENT-WRITER CONTRACT (r17 verdict #6): a ledger has exactly
   * ONE maintainer. Two concurrent folds into the same stateDir would
   * race the live→__old rename (each believing it owns the swap), so
   * [[commit]] takes a create-exclusive `<dir>.__lock` for the duration
   * of the transaction and FAILS FAST when it already exists. The lock
   * is released even when the commit body throws; only a hard process
   * death leaves it behind — and a filesystem cannot distinguish that
   * corpse from a live peer mid-commit, so [[recover]] also fails fast
   * on a surviving lock instead of silently breaking it. An operator
   * who has verified no maintainer is alive clears it with
   * [[breakLock]] (or deletes the file) and recovery proceeds as
   * documented. Pinned by LedgerSwapSpec's two-writer interleave test. */
  private def lockPath(stateDir: String) = new Path(s"$stateDir.__lock")

  /** Explicit operator action after a verified maintainer death: remove
   * a leftover commit lock so [[recover]]/[[commit]] can proceed. */
  def breakLock(spark: SparkSession, stateDir: String): Unit = {
    val lock = lockPath(stateDir)
    lock.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(lock, false): Unit
  }

  /** Repair any interrupted swap BEFORE anything reads state. */
  def recover(spark: SparkSession, stateDir: String): Unit = {
    val root = new Path(stateDir)
    val staging = new Path(s"$stateDir.__staging")
    val old = new Path(s"$stateDir.__old")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(lockPath(stateDir)))
      throw new IllegalStateException(
        s"ledger $stateDir carries a commit lock (${lockPath(stateDir)}): either a " +
          "second maintainer is folding into this stateDir right now (run exactly " +
          "one maintainer per ledger), or a previous maintainer died mid-commit — " +
          "verify no writer is alive, then LedgerSwap.breakLock() and re-run")
    if (fs.exists(staging)) {
      if (fs.exists(new Path(staging, Complete)) && !fs.exists(root))
        // crash between the two swap renames: the sealed staging IS the
        // state — finish the rename (the replay skips via its watermark)
        require(fs.rename(staging, root), s"recovery rename failed for $root")
      else fs.delete(staging, true): Unit
    }
    // leftover pre-swap state (crash before/while deleting `__old`)
    if (fs.exists(old)) fs.delete(old, true): Unit
  }

  /** The applied-batch watermark, −1 when the ledger does not exist. */
  def watermark(spark: SparkSession, stateDir: String): Long = {
    val root = new Path(stateDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path(root, BatchFile)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in).mkString.trim.toLong finally in.close()
    }
  }

  /** Does a live ledger exist at all (false ⇒ the next batch bootstraps)? */
  def exists(spark: SparkSession, stateDir: String): Boolean = {
    val root = new Path(stateDir)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(root)
  }

  /** Stage every frame of state′ and seal the staging directory — the
   * first half of [[commit]], exposed separately so the crash-window
   * tests can reproduce "sealed staging, swap not yet run". The frames
   * may read the LIVE ledger lazily — each staged write completes before
   * the live directory is touched. */
  private[run] def commitStagingForTest(spark: SparkSession, stateDir: String,
      batchId: Long, frames: Seq[(String, DataFrame)]): Unit = {
    val staging = new Path(s"$stateDir.__staging")
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(staging): Unit
    frames.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$stateDir.__staging/$name.parquet")
    }
    val bf = fs.create(new Path(staging, BatchFile), true)
    try bf.write(batchId.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally bf.close()
    fs.create(new Path(staging, Complete), true).close()
  }

  /** Stage every frame of state′, seal, swap — under the exclusive
   * commit lock (see the concurrent-writer contract above). */
  def commit(spark: SparkSession, stateDir: String, batchId: Long,
      frames: Seq[(String, DataFrame)]): Unit = {
    val root = new Path(stateDir)
    val staging = new Path(s"$stateDir.__staging")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // create-exclusive: overwrite=false throws when the lock exists
    val lock = lockPath(stateDir)
    try fs.create(lock, false).close()
    catch { case e: java.io.IOException =>
      throw new IllegalStateException(
        s"ledger $stateDir is locked by another commit ($lock): two maintainers " +
          "must not fold into one stateDir — the live→__old swap would race. " +
          "Run one maintainer per ledger (or breakLock() after a verified crash).", e)
    }
    try {
      commitStagingForTest(spark, stateDir, batchId, frames)
      // Swap via rename(live -> __old) so the live ledger is never
      // partially deleted: a recursive delete is not atomic on local
      // filesystems or object stores, and a crash mid-delete would leave a
      // PARTIAL live ledger that recover() would then treat as intact
      // (discarding the sealed staging and re-folding against it).
      val old = new Path(s"$stateDir.__old")
      if (fs.exists(old)) fs.delete(old, true): Unit
      if (fs.exists(root))
        require(fs.rename(root, old), s"ledger swap (move-aside) failed for $root")
      require(fs.rename(staging, root), s"ledger swap failed for $root")
      fs.delete(old, true): Unit
    } finally fs.delete(lock, false): Unit
  }
}
