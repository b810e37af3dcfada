package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

final class TopKAggSpec extends SparkTestBase {

  test("map-side top-k equals the window row_number formulation") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

    // aggregator: top-3 orders per customer by totalprice
    val viaAgg = orders
      .groupBy(col("o_custkey"))
      .agg(TopKAgg(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("rank0", "st")))
      .select(col("o_custkey"), col("st.tag").as("o_orderkey"),
        (col("rank0") + 1).as("rank"))

    // window baseline
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = orders
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rank"))

    assert(viaAgg.count() == viaWindow.count())
    assert(viaAgg.exceptAll(viaWindow).isEmpty)
    assert(viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("payload variant equals the window formulation and carries the payload intact") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

    // payload = o_shippriority-as-long riding along, never ordered on
    val viaAgg = orders
      .groupBy(col("o_custkey"))
      .agg(TopKPayloadAgg(col("o_totalprice"), col("o_orderkey"),
        col("o_custkey") * 1000 + col("o_orderkey") % 1000, 3).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("rank0", "st")))
      .select(col("o_custkey"), col("st.tag").as("o_orderkey"),
        col("st.payload").as("payload"), (col("rank0") + 1).as("rank"))

    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = orders
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        (col("o_custkey") * 1000 + col("o_orderkey") % 1000).as("payload"),
        col("rank"))

    assert(viaAgg.count() == viaWindow.count())
    assert(viaAgg.exceptAll(viaWindow).isEmpty)
    assert(viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("distinct variant equals dropDuplicates + window on a duplicated multiset") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    // triplicate every row — the LSH multi-table collision shape
    val dup = orders.withColumn("copy", explode(array(lit(1), lit(2), lit(3))))

    val viaAgg = dup
      .groupBy(col("o_custkey"))
      .agg(TopKAgg.distinct(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("rank0", "st")))
      .select(col("o_custkey"), col("st.tag").as("o_orderkey"),
        (col("rank0") + 1).as("rank"))

    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = dup
      .dropDuplicates("o_custkey", "o_orderkey")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rank"))

    assert(viaAgg.count() == viaWindow.count())
    assert(viaAgg.exceptAll(viaWindow).isEmpty)
    assert(viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("BottomKAgg equals the ascending window formulation on longs") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

    val viaAgg = orders
      .groupBy(col("o_custkey"))
      .agg(BottomKAgg(col("o_orderkey"), 3).as("kmin"))
      .select(col("o_custkey"), posexplode(col("kmin")).as(Seq("pos", "o_orderkey")))
      .select(col("o_custkey"), col("o_orderkey"), (col("pos") + 1).as("rn"))

    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey").asc)
    val viaWindow = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn"))

    assert(viaAgg.count() == viaWindow.count())
    assert(viaAgg.exceptAll(viaWindow).isEmpty)
    assert(viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("NaN scores sort greatest and deterministically, matching the window's desc order") {
    import spark.implicits._
    // a zero-norm vector's cosine is NaN; Spark's desc sort puts NaN
    // first. Primitive > / == are both false for NaN, which would make
    // its placement arrival-order-dependent and let it slip the
    // full-buffer early-reject — ADVICE r14. Both arrival orders must
    // agree with each other and with the window formulation.
    val rows = Seq((1L, 10L, 0.9), (1L, 11L, Double.NaN), (1L, 12L, 0.7),
      (1L, 13L, Double.NaN), (1L, 14L, 0.8))
    def run(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("key"))
      .agg(TopKAgg(col("score"), col("tag"), 3).as("top"))
      .select(posexplode(col("top")).as(Seq("rank0", "st")))
      .select(col("st.tag"), (col("rank0") + 1).as("rank"))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong)).toSet
    val fwd = run(rows.toDF("key", "tag", "score").repartition(1))
    val rev = run(rows.reverse.toDF("key", "tag", "score").repartition(1))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("score").desc, col("tag").asc)
    val viaWindow = rows.toDF("key", "tag", "score")
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select(col("tag"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong)).toSet
    assert(fwd == rev)
    assert(fwd == viaWindow) // NaN(11), NaN(13), then 0.9(10)
    assert(fwd == Set((11L, 1L), (13L, 2L), (10L, 3L)))
  }

  test("partial aggregation bound holds under repartitioning") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .repartition(13)
    val res = orders.groupBy(col("o_custkey"))
      .agg(TopKAgg(col("o_totalprice"), col("o_orderkey"), 2).as("top"))
    assert(res.filter(size(col("top")) > 2).isEmpty)
    assert(res.filter(size(col("top")) < 1).isEmpty)
  }
}
