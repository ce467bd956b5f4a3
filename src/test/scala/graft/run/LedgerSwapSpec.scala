package graft.run

import graft.SparkSpec

/**
 * Crash-window pins for the ledger-swap transaction shared by the
 * streaming maintainers. The swap is rename(live → __old) +
 * rename(staging → live) + delete(__old), chosen over delete(live) +
 * rename because a recursive delete is not atomic: a crash mid-delete
 * would leave a PARTIAL live ledger that recover() would treat as
 * intact, discarding the sealed staging and re-folding against
 * half-deleted state. With the rename form the live ledger is only ever
 * moved atomically; these tests walk each crash window recover() must
 * repair.
 */
class LedgerSwapSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  private def frame(v: Long) =
    spark.range(3).select(col("id"), lit(v).as("v"))

  private def readV(dir: String): Seq[Long] =
    spark.read.parquet(s"$dir/f.parquet").select("v")
      .collect().map(_.getLong(0)).distinct.toSeq

  test("commit swaps via move-aside: state replaced, no __old or staging left behind") {
    val dir = tmpDir() + "/ledger"
    LedgerSwap.commit(spark, dir, 0L, Seq("f" -> frame(1)))
    LedgerSwap.commit(spark, dir, 1L, Seq("f" -> frame(2)))
    assert(readV(dir) == Seq(2L))
    assert(LedgerSwap.watermark(spark, dir) == 1L)
    assert(!new java.io.File(s"$dir.__old").exists, "pre-swap state not cleaned up")
    assert(!new java.io.File(s"$dir.__staging").exists, "staging not cleaned up")
  }

  test("crash between the two swap renames: sealed staging IS the state, __old is swept") {
    val dir = tmpDir() + "/ledger"
    LedgerSwap.commit(spark, dir, 0L, Seq("f" -> frame(1)))
    // simulate: commit moved live aside and sealed staging, then died
    // before rename(staging -> live)
    val root = new java.io.File(dir)
    assert(root.renameTo(new java.io.File(s"$dir.__old")))
    LedgerSwap.commitStagingForTest(spark, dir, 1L, Seq("f" -> frame(2)))
    LedgerSwap.recover(spark, dir)
    assert(readV(dir) == Seq(2L), "recovery must finish the interrupted rename")
    assert(LedgerSwap.watermark(spark, dir) == 1L)
    assert(!new java.io.File(s"$dir.__old").exists, "stale pre-swap state survived recovery")
    assert(!new java.io.File(s"$dir.__staging").exists)
  }

  test("crash before the live dir was moved aside: sealed staging discarded, live intact") {
    val dir = tmpDir() + "/ledger"
    LedgerSwap.commit(spark, dir, 0L, Seq("f" -> frame(1)))
    // sealed staging exists but the live ledger was never touched — the
    // replay (batch not in the live watermark) will re-fold
    LedgerSwap.commitStagingForTest(spark, dir, 1L, Seq("f" -> frame(2)))
    LedgerSwap.recover(spark, dir)
    assert(readV(dir) == Seq(1L), "live ledger must survive untouched")
    assert(LedgerSwap.watermark(spark, dir) == 0L)
    assert(!new java.io.File(s"$dir.__staging").exists, "sealed staging must be discarded")
  }

  test("crash mid-delete of __old after a complete swap: leftover swept, state intact") {
    val dir = tmpDir() + "/ledger"
    LedgerSwap.commit(spark, dir, 0L, Seq("f" -> frame(1)))
    LedgerSwap.commit(spark, dir, 1L, Seq("f" -> frame(2)))
    // simulate a partially-deleted __old leftover
    new java.io.File(s"$dir.__old").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir.__old/partial.txt"), "leftover")
    LedgerSwap.recover(spark, dir)
    assert(readV(dir) == Seq(2L))
    assert(LedgerSwap.watermark(spark, dir) == 1L)
    assert(!new java.io.File(s"$dir.__old").exists, "leftover __old not swept")
  }

  test("retention: 50 commits accumulate nothing — O(frames) entries and bounded bytes") {
    // the long-running-maintainer claim (r16 verdict stretch #8): each
    // commit fully replaces the ledger, so a maintainer that folds
    // forever holds exactly one ledger's worth of files — no generation
    // garbage, no __old/__staging residue, no growth in the parent dir
    def du(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(du).sum).getOrElse(0L)
    def entryCount(f: java.io.File): Int =
      Option(f.listFiles).map(fs => fs.length + fs.map(entryCount).sum).getOrElse(0)
    val parent = new java.io.File(tmpDir())
    val dir = s"$parent/ledger"
    LedgerSwap.commit(spark, dir, 0L, Seq("f" -> frame(0), "g" -> frame(0)))
    val entries0 = entryCount(new java.io.File(dir))
    val bytes0 = du(new java.io.File(dir))
    (1L to 50L).foreach { i =>
      LedgerSwap.commit(spark, dir, i, Seq("f" -> frame(i), "g" -> frame(i)))
    }
    assert(parent.listFiles.map(_.getName).toSeq == Seq("ledger"),
      s"parent accumulated residue: ${parent.listFiles.map(_.getName).mkString(", ")}")
    val entriesN = entryCount(new java.io.File(dir))
    assert(entriesN == entries0,
      s"ledger entry count grew with commits: $entries0 -> $entriesN")
    val bytesN = du(new java.io.File(dir))
    assert(bytesN <= 2 * bytes0,
      s"ledger bytes grew with commits: $bytes0 -> $bytesN")
    assert(LedgerSwap.watermark(spark, dir) == 50L)
    assert(readV(dir) == Seq(50L))
  }

  test("two interleaved writers on one stateDir: second commit fails fast (r17 verdict #6)") {
    val dir = tmpDir() + "/ledger"
    LedgerSwap.commit(spark, dir, 0L, Seq("f" -> frame(1)))
    // writer A is mid-commit: its create-exclusive lock is on disk
    val lock = new java.io.File(s"$dir.__lock")
    assert(lock.createNewFile(), "test lock setup")
    // writer B interleaves: both its fold entry points must fail fast,
    // leaving A's transaction (and the live ledger) untouched
    val eCommit = intercept[IllegalStateException] {
      LedgerSwap.commit(spark, dir, 1L, Seq("f" -> frame(2)))
    }
    assert(eCommit.getMessage.contains("locked by another commit"), eCommit.getMessage)
    val eRecover = intercept[IllegalStateException] {
      LedgerSwap.recover(spark, dir)
    }
    assert(eRecover.getMessage.contains("commit lock"), eRecover.getMessage)
    assert(readV(dir) == Seq(1L), "interleaved writer must not touch the live ledger")
    assert(LedgerSwap.watermark(spark, dir) == 0L)
    // operator verified A is dead: breakLock, then the fold proceeds
    LedgerSwap.breakLock(spark, dir)
    LedgerSwap.recover(spark, dir)
    LedgerSwap.commit(spark, dir, 1L, Seq("f" -> frame(2)))
    assert(readV(dir) == Seq(2L))
    assert(LedgerSwap.watermark(spark, dir) == 1L)
    assert(!lock.exists, "commit must release its lock")
  }

  test("a failing commit body releases the lock (only process death leaves one)") {
    val dir = tmpDir() + "/ledger"
    // a frame whose materialization throws at write time
    val bad = spark.range(1).selectExpr("assert_true(id > 0) AS boom", "id")
    intercept[Throwable] {
      LedgerSwap.commit(spark, dir, 0L, Seq("f" -> bad))
    }
    assert(!new java.io.File(s"$dir.__lock").exists,
      "lock must be released when the commit body throws")
    // the ledger is then writable again
    LedgerSwap.commit(spark, dir, 0L, Seq("f" -> frame(1)))
    assert(readV(dir) == Seq(1L))
  }
}
