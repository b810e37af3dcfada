package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Bucketing = pre-partitioned co-located joins: both sides bucketed
  * on the join key with the same bucket count must join with ZERO
  * Exchange (shuffle) nodes in the physical plan.
  */
final class BucketedJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("join of co-bucketed tables plans without a shuffle") {
    val orders = (1L to 1000L).map(k => (k, s"o$k")).toDF("k", "o")
    val items  = (1L to 3000L).map(i => (i % 1000 + 1, s"i$i")).toDF("k", "i")

    Sinks.bucketedTable(orders, "b_orders", "k", 8)
    Sinks.bucketedTable(items, "b_items", "k", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_items"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 3000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
    }
  }
}
