package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

final class PageRankSpec extends SparkTestBase {

  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    PageRank.run(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("a symmetric pair stays uniform") {
    val pr = ranks(Seq(1L -> 2L, 2L -> 1L), iters = 3)
    assert(pr(1L) == 0.5 && pr(2L) == 0.5)
  }

  test("the hub of a star out-ranks the leaves") {
    // center 0 <-> leaves 1..5, symmetric
    val edges = (1L to 5L).flatMap(l => Seq(0L -> l, l -> 0L))
    val pr = ranks(edges, iters = 5)
    val leaves = (1L to 5L).map(pr)
    assert(leaves.forall(_ < pr(0L)))
    // symmetric leaves must agree exactly (determinism across keys)
    assert(leaves.distinct.size == 1)
  }

  test("rank mass is conserved (no dangling nodes on symmetric edges)") {
    val edges = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L, 3L -> 4L, 4L -> 3L)
    val pr = ranks(edges, iters = 4)
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)
  }

  test("dangling nodes leak mass but never gain spurious rank") {
    // 1 -> 2 only: node 2 is dangling (outdeg 0)
    val pr = ranks(Seq(1L -> 2L), iters = 2)
    assert(pr(2L) > pr(1L)) // 2 receives 1's full contribution
    assert(pr.values.sum < 1.0) // 2's mass drops (documented semantics)
  }

  test("iterations converge toward the stationary distribution") {
    // chain 1 - 2 - 3 (symmetric): stationary pr(2) = deg/2m = 2/4
    val edges = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L)
    val pr = ranks(edges, iters = 20)
    assert(math.abs(pr(2L) - 0.5) < 0.05)
    assert(math.abs(pr(1L) - 0.25) < 0.05)
  }

  test("weighted with w=1 equals unweighted; heavier edges pull rank") {
    import spark.implicits._
    val edges = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L, 1L -> 3L, 3L -> 1L)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val unw = m(PageRank.run(edges.toDF("src", "dst"), iters = 3))
    val w1  = m(PageRank.runWeighted(
      edges.map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "w"), iters = 3))
    assert(unw == w1) // bit-identical: same quantized contributions

    // triangle where the 1-2 edge is 10x heavier: 1 and 2 out-rank 3
    val heavy = Seq((1L, 2L, 10L), (2L, 1L, 10L), (2L, 3L, 1L),
      (3L, 2L, 1L), (1L, 3L, 1L), (3L, 1L, 1L)).toDF("src", "dst", "w")
    val pr = m(PageRank.runWeighted(heavy, iters = 15))
    assert(pr(1L) > pr(3L) && pr(2L) > pr(3L), s"got $pr")
  }
}
