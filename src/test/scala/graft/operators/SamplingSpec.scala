package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

final class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val rows = (0L until 5000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
    .toDF("id", "stratum")

  test("hash sampling is deterministic and partitioning-independent") {
    val once  = Sampling.hashSample(rows, col("id"), 0.3).select("id").collect().map(_.getLong(0)).toSet
    val again = Sampling.hashSample(rows.repartition(13), col("id"), 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(once == again)
    // ~30% within sampling tolerance
    assert(math.abs(once.size - 1500) < 150, s"got ${once.size} of 5000 at rate 0.3")
  }

  test("different salts draw independent samples; rate 0 and 1 are exact") {
    val s1 = Sampling.hashSample(rows, col("id"), 0.5, salt = "one")
      .select("id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(rows, col("id"), 0.5, salt = "two")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(s1 != s2)
    // independence: overlap ≈ 25% of the population
    val overlap = (s1 & s2).size
    assert(math.abs(overlap - 1250) < 200, s"overlap $overlap")
    assert(Sampling.hashSample(rows, col("id"), 0.0).count() == 0L)
    assert(Sampling.hashSample(rows, col("id"), 1.0).count() == 5000L)
  }

  test("stratified rates apply per stratum; a subset relation holds as rates grow") {
    val mixed = Sampling.stratifiedSample(rows, col("id"), col("stratum"),
      rates = Map("a" -> 0.6), defaultRate = 0.1)
    val byStratum = mixed.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byStratum("a") - 1500) < 150, s"stratum a: ${byStratum("a")} of 2500 at 0.6")
    assert(math.abs(byStratum("b") - 250) < 80, s"stratum b: ${byStratum("b")} of 2500 at 0.1")

    // growing a rate only ADDS rows (threshold semantics): lineage-friendly
    val small = Sampling.hashSample(rows, col("id"), 0.2).select("id").collect().map(_.getLong(0)).toSet
    val large = Sampling.hashSample(rows, col("id"), 0.4).select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large))
  }
}
