package graft.operators

import graft.SparkTestBase

final class BfsSpec extends SparkTestBase {
  import spark.implicits._

  private def undirected(edges: Seq[(Long, Long)]) =
    (edges ++ edges.map(_.swap)).toDF("src", "dst")

  private def run(edges: Seq[(Long, Long)], sources: Seq[Long],
                  maxHops: Int): Map[Long, Int] =
    Bfs.distances(undirected(edges), sources.toDF("id"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("path graph: distances are the hop indices") {
    val chain = (0L until 9L).map(i => (i, i + 1))
    assert(run(chain, Seq(0L), 20) == (0L to 9L).map(i => i -> i.toInt).toMap)
  }

  test("maxHops caps exploration; beyond-cap nodes report -1") {
    val chain = (0L until 9L).map(i => (i, i + 1))
    val d = run(chain, Seq(0L), 3)
    assert(d(3L) == 3 && d(4L) == -1 && d(9L) == -1)
  }

  test("disconnected component is -1; multi-source takes the minimum") {
    val twoIslands = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val d = run(twoIslands, Seq(1L), 10)
    assert(d == Map(1L -> 0, 2L -> 1, 3L -> 2, 10L -> -1, 11L -> -1))
    val multi = run(twoIslands, Seq(3L, 10L), 10)
    assert(multi == Map(3L -> 0, 2L -> 1, 1L -> 2, 10L -> 0, 11L -> 1))
  }

  test("sources outside the edge set are ignored; direction respected") {
    val directed = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val d = Bfs.distances(directed, Seq(3L, 99L).toDF("id"), 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // 3 has no OUT-edges: only itself is reached; 99 isn't in the graph
    assert(d == Map(1L -> -1, 2L -> -1, 3L -> 0))
  }

  test("cycle terminates before maxHops (frontier exhaustion)") {
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(run(cyc, Seq(1L), 1000) == Map(1L -> 0, 2L -> 1, 3L -> 1))
  }
}
