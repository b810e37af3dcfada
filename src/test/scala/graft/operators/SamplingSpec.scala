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

  private lazy val sized = rows.withColumn("n_tokens", (col("id") % 7 + 1).cast("long"))

  test("token budget: two-level cumsum equals the naive per-stratum window") {
    import org.apache.spark.sql.expressions.Window
    val got = Sampling.tokenBudget(sized, col("id"), col("stratum"),
        col("n_tokens"), budget = 500L)
      .select("id", "cum_tokens", "kept").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // naive reference: ONE window per stratum over the same hash order
    val h = graft.functions.Md5Bucket60(concat_ws("|", col("id").cast("string"), lit("graft")))
    val w = Window.partitionBy(col("stratum")).orderBy(h, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = sized.withColumn("cum", sum(col("n_tokens")).over(w))
      .select("id", "cum").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(1) <= 500L)).toMap
    assert(got == want)
  }

  test("token budget keeps a stable prefix: a bigger budget only adds documents") {
    def keptAt(b: Long): Set[Long] =
      Sampling.tokenBudget(sized, col("id"), col("stratum"), col("n_tokens"), b)
        .filter(col("kept")).select("id").collect().map(_.getLong(0)).toSet
    val small = keptAt(300L)
    val large = keptAt(900L)
    assert(small.subsetOf(large) && small.nonEmpty && large.size > small.size)
    // per-stratum totals of kept docs actually respect the budget
    val sums = Sampling.tokenBudget(sized, col("id"), col("stratum"), col("n_tokens"), 300L)
      .filter(col("kept")).groupBy("stratum").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums.values.forall(_ <= 300L), s"budget exceeded: $sums")
  }

  test("train/valid/test split: exhaustive, disjoint, growth-stable, near-proportional") {
    val base = (1L to 4000L).toDF("id")
    val fr = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    def splits(df: org.apache.spark.sql.DataFrame) =
      Sampling.trainValidTestSplit(df, col("id"), fr)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s1 = splits(base)
    // exhaustive + disjoint by construction: exactly one split per key
    assert(s1.size == 4000 && s1.values.toSet == Set("train", "valid", "test"))
    // a key's split never changes when the corpus grows
    val s2 = splits((1L to 8000L).toDF("id"))
    assert((1L to 4000L).forall(k => s2(k) == s1(k)))
    // proportions land near the fractions (hash uniformity)
    val n = s1.values.groupBy(identity).map { case (k, v) => k -> v.size }
    assert(math.abs(n("train") - 3200) < 150 && math.abs(n("valid") - 400) < 80,
      s"proportions off: $n")
  }
}
