package graft.dedup

import graft.SparkTestBase

final class ClustersSpec extends SparkTestBase {
  import spark.implicits._

  test("connected components: chains merge, singletons keep own rep") {
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("a", "b")

    val comp = Clusters.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L))
    assert(Seq(10L, 11L).forall(comp(_) == 10L))
    assert(Seq(20L, 21L, 22L).forall(comp(_) == 20L))
    assert(comp.size == 9)
  }

  test("long chain converges within the iteration cap") {
    val pairs = (1L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    val comp = Clusters.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.values.forall(_ == 1L))
  }
}
