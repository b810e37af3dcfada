package graft.operators

import graft.SparkTestBase

final class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  test("known 2D front: minimize x, maximize y") {
    val pts = Seq( // (id, x, y)
      (1L, 1.0, 1.0),  // front (cheapest)
      (2L, 2.0, 5.0),  // front
      (3L, 3.0, 5.0),  // dominated by 2 (same y, worse x)
      (4L, 5.0, 9.0),  // front
      (5L, 6.0, 8.0),  // dominated by 4
      (6L, 1.0, 0.5)   // dominated by 1
    ).toDF("id", "x", "y")
    val got = Skyline.pareto(pts, minimize = Seq("x"), maximize = Seq("y"))
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L))
  }

  test("exact ties are all kept; null criteria are excluded") {
    val pts = Seq(
      (1L, Some(1.0), Some(2.0)), (2L, Some(1.0), Some(2.0)), // identical front pair
      (3L, Some(0.5), None),                                  // null dim: excluded
      (4L, Some(2.0), Some(1.0))                              // dominated by 1/2
    ).toDF("id", "x", "y")
    val got = Skyline.pareto(pts, Seq("x"), Seq("y"))
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("matches brute force on a deterministic 3-criteria set") {
    val rows = (0 until 400).map { i =>
      val a = (i * 37 % 101).toDouble       // minimize
      val b = (i * 53 % 97).toDouble        // maximize
      val c = (i * 71 % 89).toDouble        // maximize
      (i.toLong, a, b, c)
    }
    def dominates(p: (Long, Double, Double, Double),
                  q: (Long, Double, Double, Double)): Boolean =
      p._2 <= q._2 && p._3 >= q._3 && p._4 >= q._4 &&
        (p._2 < q._2 || p._3 > q._3 || p._4 > q._4)
    val expected = rows.filter(q => !rows.exists(p => dominates(p, q)))
      .map(_._1).toSet
    val got = Skyline.pareto(rows.toDF("id", "a", "b", "c"),
        minimize = Seq("a"), maximize = Seq("b", "c"))
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  test("result is stable under repartitioning") {
    val rows = (0 until 300).map(i =>
      (i.toLong, (i * 13 % 71).toDouble, (i * 29 % 83).toDouble))
    val df = rows.toDF("id", "x", "y")
    def ids(d: org.apache.spark.sql.DataFrame) =
      Skyline.pareto(d, Seq("x"), Seq("y")).select($"id")
        .collect().map(_.getLong(0)).toSet
    assert(ids(df) == ids(df.repartition(17)))
  }
}
