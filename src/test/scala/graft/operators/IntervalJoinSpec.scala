package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

final class IntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val W = 100L // bin width for the tests

  // deterministic pseudo-random intervals: id-derived start/len
  private def side(tag: String, n: Int, keyMod: Int, lenMod: Int): DataFrame =
    spark.range(n).select(
      (col("id") % keyMod).as("k"),
      col("id").as(s"${tag}_id"),
      ((col("id") * 37 + hash(col("id"), lit(tag)).cast("long") % 1000 + 1000) % 997)
        .as(s"${tag}_s"))
      .withColumn(s"${tag}_e",
        col(s"${tag}_s") + (col(s"${tag}_id") * 13 + 1) % lenMod + 1)

  private def naive(l: DataFrame, r: DataFrame): Set[(Long, Long)] =
    l.join(r, Seq("k"))
      .filter(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet

  test("binned overlap equals the naive inequality join") {
    val l = side("a", 300, 7, 350) // intervals span multiple bins
    val r = side("b", 280, 7, 250)
    val got = IntervalJoin.overlap(l, r, "k", "a_s", "a_e", "b_s", "b_e", W)
      .select($"a_id", $"b_id").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "pair emitted more than once")
    assert(got.toSet == naive(l, r))
  }

  test("a pair overlapping across many bins is emitted exactly once") {
    val l = Seq((1L, 10L, 5L, 905L)).toDF("k", "a_id", "a_s", "a_e") // 10 bins
    val r = Seq((1L, 20L, 250L, 850L)).toDF("k", "b_id", "b_s", "b_e")
    val rows = IntervalJoin.overlap(l, r, "k", "a_s", "a_e", "b_s", "b_e", W)
    assert(rows.count() == 1)
  }

  test("half-open semantics: touching intervals do not match; zero-length dropped") {
    val l = Seq((1L, 1L, 0L, 100L), (1L, 2L, 500L, 500L)).toDF("k", "a_id", "a_s", "a_e")
    val r = Seq((1L, 9L, 100L, 200L), (1L, 8L, 400L, 600L)).toDF("k", "b_id", "b_s", "b_e")
    val got = IntervalJoin.overlap(l, r, "k", "a_s", "a_e", "b_s", "b_e", W)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    // [0,100) vs [100,200): touch only. (500,500] is empty: no match with [400,600).
    assert(got.isEmpty)
  }

  test("bin-boundary end: interval ending exactly on a boundary stays in its last bin") {
    val l = Seq((1L, 1L, 150L, 200L)).toDF("k", "a_id", "a_s", "a_e") // bin 1 only
    val r = Seq((1L, 9L, 199L, 320L)).toDF("k", "b_id", "b_s", "b_e") // bins 1..3
    assert(IntervalJoin.overlap(l, r, "k", "a_s", "a_e", "b_s", "b_e", W).count() == 1)
  }

  test("negative coordinates bin correctly (floor, not truncate-toward-zero)") {
    val l = Seq((1L, 1L, -150L, -50L)).toDF("k", "a_id", "a_s", "a_e")
    val r = Seq((1L, 9L, -60L, 10L)).toDF("k", "b_id", "b_s", "b_e")
    assert(IntervalJoin.overlap(l, r, "k", "a_s", "a_e", "b_s", "b_e", W).count() == 1)
  }

  test("coalesce merges overlapping and touching intervals into disjoint spans") {
    val iv = Seq(
      (1L, 0L, 50L), (1L, 40L, 90L), (1L, 90L, 120L), // chain: overlap + touch
      (1L, 200L, 300L), (1L, 210L, 250L),             // contained
      (1L, 400L, 400L),                               // zero-length: dropped
      (2L, 10L, 20L), (2L, 30L, 40L)                  // disjoint: two spans
    ).toDF("k", "s", "e")
    val got = IntervalJoin.coalesce(iv, "k", "s", "e")
      .select($"k", $"span_start", $"span_end", $"n_intervals")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 120L, 3L), (1L, 200L, 300L, 2L),
      (2L, 10L, 20L, 1L), (2L, 30L, 40L, 1L)))
  }

  test("coalesce spans are disjoint and cover exactly the naive union") {
    val iv = side("a", 400, 5, 300)
      .select($"k", $"a_s".as("s"), $"a_e".as("e"))
    val spans = IntervalJoin.coalesce(iv, "k", "s", "e")
      .select($"k", $"span_start", $"span_end")
      .as[(Long, Long, Long)].collect()
    // pairwise disjoint (not even touching) per key
    spans.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) => assert(e1 < s2)
        case _ =>
      }
    }
    // coverage: every covered point is in a span, span points are covered
    val naiveCover = iv.as[(Long, Long, Long)].collect()
      .flatMap { case (k, s, e) => (s until e).map(k -> _) }.toSet
    val spanCover = spans
      .flatMap { case (k, s, e) => (s until e).map(k -> _) }.toSet
    assert(spanCover == naiveCover)
  }

  test("overlapping non-key column names are rejected") {
    val l = Seq((1L, 1L, 0L, 10L)).toDF("k", "x", "a_s", "a_e")
    val r = Seq((1L, 2L, 0L, 10L)).toDF("k", "x", "b_s", "b_e")
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.overlap(l, r, "k", "a_s", "a_e", "b_s", "b_e", W)
    }
    assert(e.getMessage.contains("disjoint"))
  }
}
