package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage-by-stage cost of the melted banded kNN at ScaleBench
 * geometry (deleted before commit). */
object DevKnnProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probe = new org.apache.spark.sql.graft.TaskMetricsProbe
    spark.sparkContext.addSparkListener(probe)
    val n = 500000L
    val emb = spark.read.parquet(
      s"${sys.props("java.io.tmpdir")}/graft-scalebench/embs_$n")
    val bands = 3
    val rule = math.max(8, (math.log(n.toDouble / 32.0) / math.log(2)).ceil.toInt)
    val bandPlanes = math.min(rule + 2, 20)
    def t(label: String)(f: => Unit): Unit = {
      probe.drain(spark.sparkContext); probe.reset()
      val t0 = System.nanoTime(); f
      probe.drain(spark.sparkContext)
      println(f"[prof] $label%-28s wall=${(System.nanoTime() - t0) / 1e9}%7.2f cpu=${probe.cpuTimeNs.get / 1e9}%8.1f")
    }
    import graft.ext.Similarity.{dot, norm, planeComponent}
    val VecDim = graft.ext.Similarity.VecDim
    t("parts probe") { println("[prof] input partitions=" +
      emb.rdd.getNumPartitions + " rows=" + emb.count()) }
    val base = emb.select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val allDots = for (b <- 0 until bands; j <- 0 until bandPlanes) yield {
      val plane = array((0 until VecDim).map(i => lit(planeComponent(b * bandPlanes + j, i))): _*)
      dot(col("embedding"), plane).as(s"__d${b}_$j")
    }
    var cur = base.select(col("vec_id") +: col("embedding") +: col("nrm") +: allDots: _*)
    (0 until bands).foreach { b =>
      val dnames = (0 until bandPlanes).map(j => s"__d${b}_$j")
      cur = cur.withColumn(s"__bk$b",
        dnames.zipWithIndex.map { case (d, j) =>
          when(col(d) > 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _))
      cur = cur.withColumn(s"__pb$b", array(col(s"__bk$b")))
    }
    var staged: org.apache.spark.sql.DataFrame = null
    t("checkpoint construct") {
      staged = cur.select(
          col("vec_id") +: col("embedding") +: col("nrm") +:
            (0 until bands).flatMap(b => Seq(col(s"__bk$b"), col(s"__pb$b"))): _*)
        .localCheckpoint(eager = false)
    }
    t("checkpoint materialize") { println("[prof] staged=" + staged.count()) }
    t("gate agg") {
      val melted = staged.select(col("vec_id"),
          posexplode(array((0 until bands).map(b =>
            struct(col(s"__bk$b").as("bk"), col(s"__pb$b").as("pb"))): _*))
            .as(Seq("band", "z")))
      println("[prof] over=" + melted.groupBy(col("band"), col("z.bk"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 2000).count())
    }
    spark.stop()
  }
}
