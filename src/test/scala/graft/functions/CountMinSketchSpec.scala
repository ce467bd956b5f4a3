package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.agg(CountMinSketch.udafFn(col("tok")).as("s")).as[Seq[Long]].head()

  test("sketch is partition-order independent (merge is commutative addition)") {
    val toks = Seq.tabulate(5000)(i => (i % 97).toLong).toDF("tok")
    val a = sketchOf(toks.repartition(1))
    val b = sketchOf(toks.repartition(13))
    assert(a == b)
  }

  test("estimates never undercount and are exact without collisions") {
    val counts = Map(7L -> 1200L, 11L -> 35L, 999999L -> 1L)
    val toks = counts.toSeq.flatMap { case (t, n) => Seq.fill(n.toInt)(t) }.toDF("tok")
    val sk = sketchOf(toks)
    def est(x: Long): Long =
      (0 until CountMinSketch.Depth).map(i =>
        sk(i * CountMinSketch.Width + CountMinSketch.bucket(i, x))).min
    counts.foreach { case (t, n) =>
      assert(est(t) >= n, s"undercount for $t")
      assert(est(t) <= n + counts.values.sum, "estimate out of bounds")
    }
    // 3 distinct values in 4x512 cells: collisions are impossible per row
    counts.foreach { case (t, n) => assert(est(t) == n) }
    assert(est(123456L) == 0L, "absent token must estimate 0 here")
  }
}
