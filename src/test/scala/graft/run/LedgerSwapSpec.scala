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
}
