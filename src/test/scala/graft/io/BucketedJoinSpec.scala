package graft.io

import graft.SparkSpec
import graft.jobs.DiffData

/** The co-located join scale path: two tables bucketed on the PK must
 * reconcile with ZERO shuffle — at 100 TB this is the difference between
 * moving both tables over the network and moving nothing. */
class BucketedJoinSpec extends SparkSpec {

  test("DiffData over PK-bucketed tables plans without any shuffle exchange") {
    val o = spark.read.parquet(s"$Sf/orders.parquet")
    TableIO.writeBucketed(o, "orders_origin_b", Seq("o_orderkey"), 8)
    TableIO.writeBucketed(o, "orders_target_b", Seq("o_orderkey"), 8)
    try {
      val origin = spark.table("orders_origin_b")
      val target = spark.table("orders_target_b")
      val classified = DiffData.classify(origin, target, Seq("o_orderkey"))
      // disable broadcast so the plan must choose a co-located join
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = classified.queryExecution.executedPlan.toString
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed reconciliation still shuffles:\n${plan.take(3000)}")
      assert(classified.filter(classified("diff_class") =!= DiffData.Valid).count() == 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_origin_b")
      spark.sql("DROP TABLE IF EXISTS orders_target_b")
    }
  }
}
