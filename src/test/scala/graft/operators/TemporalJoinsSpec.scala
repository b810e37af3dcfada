package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

final class TemporalJoinsSpec extends SparkTestBase {
  import spark.implicits._

  test("asOf picks the latest right row at-or-before, null when none") {
    val left = Seq(
      (1L, 100L, "e1"), (1L, 250L, "e2"), (1L, 50L, "e0"),
      (2L, 500L, "e3")
    ).toDF("k", "t", "name")
    val right = Seq(
      (1L, 100L, "r@100"), (1L, 200L, "r@200"),
      (2L, 600L, "r@600")
    ).toDF("k", "rt", "v")

    val res = TemporalJoins.asOf(left, right, "k", "t", "rt", Seq("v"))
      .collect().map(r => r.getAs[String]("name") -> r.getAs[String]("v")).toMap

    assert(res("e0") == null)      // nothing at or before 50
    assert(res("e1") == "r@100")   // tie: at-or-before is inclusive
    assert(res("e2") == "r@200")   // latest of 100/200
    assert(res("e3") == null)      // right row is after the left time
  }

  test("rangeJoin equals the naive inequality join") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 300).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong, i))
      .toDF("k", "start", "lid")
    val right = (1 to 500).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(12000).toLong, i))
      .toDF("k", "rt", "rid")
    val width = 700L

    val naive = left.join(right, Seq("k"))
      .filter(col("rt") >= col("start") && col("rt") < col("start") + width)
      .select("lid", "rid")
    val bucketed = TemporalJoins.rangeJoin(
        left, right, "k", col("start"), col("rt"), width)
      .select("lid", "rid")

    assert(bucketed.count() == naive.count())
    assert(naive.exceptAll(bucketed).isEmpty)
    assert(bucketed.exceptAll(naive).isEmpty)
  }
}
