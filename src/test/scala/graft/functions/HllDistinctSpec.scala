package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

final class HllDistinctSpec extends SparkTestBase {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame) = df
    .agg(HllDistinct(concat_ws("|", lit("s"), $"k".cast("string"))).as("h"))
    .select($"h.est_parts", $"h.hll_zeros", $"h.hll_digest")
    .collect().head

  test("estimate tracks the true distinct count within HLL error (m=64 → ~13%)") {
    val df = (1 to 5000).map(i => i % 1000).toDF("k") // 1000 distinct, 5× dups
    val row = sketch(df)
    val est = row.getDouble(0)
    assert(math.abs(est - 1000.0) / 1000.0 < 0.3, s"est $est")
  }

  test("sketch is invariant to partitioning and duplication (merge correctness)") {
    val base = (1 to 2000).toDF("k")
    val a = sketch(base)
    val b = sketch(base.repartition(17))
    val c = sketch(base.union(base).repartition(3)) // duplicates are no-ops
    assert(a == b && b == c)
  }

  test("buffers are 64 bytes and mergeable: split-sketch equals whole-sketch") {
    // exercises serialize/deserialize + merge through a real shuffle:
    // per-group partials on 8 partitions must fold to the same digest
    val df = (1 to 3000).map(i => (i % 3, i)).toDF("g", "k").repartition(8)
    val grouped = df.groupBy($"g")
      .agg(HllDistinct(concat_ws("|", lit("s"), $"k".cast("string"))).as("h"))
      .select($"g", $"h.hll_digest").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val singles = (0 to 2).map { g =>
      g -> sketch(df.filter($"g" === g).select($"k")).getString(2)
    }.toMap
    assert(grouped == singles)
  }

  test("SQL registration: hll_distinct is callable from spark.sql") {
    (1 to 100).toDF("k").createOrReplaceTempView("hll_in")
    graft.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      """SELECT hll_distinct(concat_ws('|', 's', cast(k AS string))).hll_digest AS d
        |FROM hll_in""".stripMargin).collect().head.getString(0)
    assert(viaSql == sketch((1 to 100).toDF("k")).getString(2))
  }
}
