package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

final class KmvQuantilesSpec extends SparkTestBase {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int = 64) = df
    .agg(KmvQuantiles(concat_ws("|", lit("s"), $"id".cast("string")),
      $"v", k, Seq(0.25, 0.5, 0.75, 0.9)).as("sk"))
    .select($"sk.n_sample", $"sk.quantiles")
    .collect().head

  test("a group smaller than k degrades to exact interpolated quantiles") {
    // 0.0 .. 100.0 step 1: p25 = 25, p50 = 50, p75 = 75, p90 = 90
    val df  = (0 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val row = sketch(df, k = 256)
    assert(row.getLong(0) == 101L)
    assert(row.getSeq[Double](1) == Seq(25.0, 50.0, 75.0, 90.0))
  }

  test("sketch is invariant to partitioning and input duplication") {
    val base = (1 to 5000).map(i => (i.toLong, (i % 997).toDouble)).toDF("id", "v")
    val a = sketch(base)
    val b = sketch(base.repartition(17))
    val c = sketch(base.union(base).repartition(3)) // same (hash, value) pairs
    assert(a == b && b == c)
  }

  test("grouped partials through a shuffle equal per-group whole sketches") {
    val df = (1 to 3000).map(i => (i % 3, i.toLong, (i * 7 % 1000).toDouble))
      .toDF("g", "id", "v").repartition(8)
    val grouped = df.groupBy($"g")
      .agg(KmvQuantiles(concat_ws("|", lit("s"), $"id".cast("string")),
        $"v", 64, Seq(0.5, 0.9)).as("sk"))
      .select($"g", $"sk.quantiles").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val singles = (0 to 2).map { g =>
      val row = df.filter($"g" === g)
        .agg(KmvQuantiles(concat_ws("|", lit("s"), $"id".cast("string")),
          $"v", 64, Seq(0.5, 0.9)).as("sk"))
        .select($"sk.quantiles").collect().head
      g -> row.getSeq[Double](0)
    }.toMap
    assert(grouped == singles)
  }

  test("sample quantiles track true quantiles on a large uniform group") {
    // 100k uniform values, k=256 sample: p50 within ~3/sqrt(256) ≈ 20%
    val df  = (1 to 100000).map(i => (i.toLong, (i % 10000).toDouble)).toDF("id", "v")
    val row = sketch(df, k = 256)
    assert(row.getLong(0) == 256L)
    val p50 = row.getSeq[Double](1)(1)
    assert(math.abs(p50 - 5000.0) < 1500.0, s"p50 $p50")
  }

  test("null keys and values are skipped, empty input yields null quantiles") {
    val df = Seq((Some(1L), Some(2.0)), (None, Some(3.0)), (Some(2L), None))
      .toDF("id", "v")
    // concat (not concat_ws): a null id must null the key out entirely
    val row = df
      .agg(KmvQuantiles(concat(lit("s"), $"id".cast("string")),
        $"v", 8, Seq(0.5)).as("sk"))
      .select($"sk.n_sample", $"sk.quantiles").collect().head
    assert(row.getLong(0) == 1L && row.getSeq[Double](1) == Seq(2.0))
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    val er = sketch(empty)
    assert(er.getLong(0) == 0L && er.getSeq[Any](1) == Seq(null, null, null, null))
  }
}
