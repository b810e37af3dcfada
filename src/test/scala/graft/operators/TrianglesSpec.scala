package graft.operators

import graft.SparkTestBase

final class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("single triangle: every node in exactly one") {
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 1L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("square without diagonals has zero triangles (zero-inclusive output)") {
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) ==
      Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("K4: four triangles, each node in three") {
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    assert(count(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("duplicate, reversed, and self-loop edges do not change the count") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L), (3L, 3L))
    assert(count(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("matches brute force on a deterministic pseudo-random graph") {
    // 40 nodes, edge (i,j) present iff (i*31 + j*17) % 7 == 0 — dense
    // enough for hundreds of triangles, irregular degrees
    val edges = for {
      i <- 0L until 40L; j <- (i + 1) until 40L
      if (i * 31 + j * 17) % 7 == 0
    } yield (i, j)
    val adj = edges.toSet
    def has(a: Long, b: Long) = adj.contains((math.min(a, b), math.max(a, b)))
    val brute = (for {
      a <- 0L until 40L; b <- (a + 1) until 40L; c <- (b + 1) until 40L
      if has(a, b) && has(b, c) && has(a, c)
    } yield Seq(a, b, c)).flatten
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val expected = (0L until 40L).map(n => n -> brute.getOrElse(n, 0L)).toMap
    // brute force over nodes; operator only reports nodes WITH edges
    val connected = edges.flatMap(e => Seq(e._1, e._2)).toSet
    assert(count(edges) == expected.filter(kv => connected(kv._1)))
  }
}
