package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

final class SketchSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("built-in HLL++ approx distinct is within 5% of exact") {
    val row = Tables(spark, sf, "lineitem")
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .head()
    def relErr(approx: Long, exact: Long): Double =
      math.abs(approx - exact).toDouble / exact
    assert(relErr(row.getAs[Long]("approx_parts"), row.getAs[Long]("exact_parts")) < 0.05)
    assert(relErr(row.getAs[Long]("approx_orders"), row.getAs[Long]("exact_orders")) < 0.05)
  }

  test("deterministic HLL (q28) estimate within m=64 error bounds; sampled median near exact") {
    val rows = Relational.queries("q28_sketches")(spark, sf).collect()
    assert(rows.length == 3) // one per l_returnflag
    // HLL standard error for m=64 is 1.04/sqrt(64) = 13%; allow 3 sigma.
    rows.foreach { r =>
      val est = r.getAs[Double]("est_parts")
      val exact = r.getAs[Long]("exact_parts")
      assert(math.abs(est - exact) / exact < 0.39,
        s"flag=${r.getAs[String]("l_returnflag")}: est=$est exact=$exact")
      assert(r.getAs[String]("hll_digest").length == 32)
    }
    // Sampled median should track the exact median of the full column.
    val exactMed = Tables(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(cast(l_extendedprice as decimal(18,2)), 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val sampled = r.getAs[Double]("median_price")
      val ex = exactMed(flag)
      assert(math.abs(sampled - ex) / ex < 0.10,
        s"flag=$flag: sampled=$sampled exact=$ex")
      assert(r.getAs[Long]("sample_n") > 0)
    }
  }
}
