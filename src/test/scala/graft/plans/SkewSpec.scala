package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase

final class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of the large side hits one key
    val large = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong % 100 else 7L, i))
      .toDF("k", "v")
    val small = (0L until 100L).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain  = large.join(small, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(large, small, "k", buckets = 8).select("k", "v", "name")

    assert(salted.count() == plain.count())
    assert(plain.exceptAll(salted).isEmpty)
    assert(salted.exceptAll(plain).isEmpty)
  }

  test("keySkew surfaces the hot key") {
    val large = (1 to 1000).map(i => (if (i <= 900) 7L else i.toLong, i)).toDF("k", "v")
    val top = Skew.keySkew(large, col("k"), topN = 1).head()
    assert(top.getAs[Long]("key") == 7L)
    assert(top.getAs[Double]("share") > 0.8)
  }
}
