package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

final class GlobPushdownSpec extends SparkTestBase {
  import spark.implicits._

  test("columnPredicate pushes the glob's literal prefix to the parquet scan") {
    val path = tmpDir("glob-push") + "/keys"
    (0 until 2000).map(i => (s"src${i % 7}/part-$i", i.toLong))
      .toDF("key", "v").write.parquet(path)
    val df = spark.read.parquet(path)

    val g = Glob("src3/part-1*")
    assert(g.literalPrefix == "src3/part-1")

    val pushed = df.filter(g.columnPredicate(col("key")))
    val plan = pushed.queryExecution.executedPlan.toString
    assert(plan.contains("StringStartsWith(key,src3/part-1"),
      s"prefix must reach PushedFilters:\n$plan")

    // redundant conjunct: same rows as the regex alone
    val want = df.filter(col("key").rlike(g.fullRegex))
      .select("key").collect().map(_.getString(0)).toSet
    val got = pushed.select("key").collect().map(_.getString(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("a glob with no literal prefix degrades to the bare regex predicate") {
    val g = Glob("*-suffix")
    assert(g.literalPrefix.isEmpty)
    val df = Seq("a-suffix", "b-suffix", "a-suffix/x", "nope").toDF("key")
    val got = df.filter(g.columnPredicate(col("key")))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("a-suffix", "b-suffix"))
  }
}
