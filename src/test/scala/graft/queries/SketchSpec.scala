package graft.queries

import graft.SparkTestBase

final class SketchSpec extends SparkTestBase {

  test("HLL approx distinct is within 5% of exact") {
    val row = Relational.queries("q28_sketches")(spark, "/root/testdata/sf0.01").head()
    def relErr(approx: Long, exact: Long): Double =
      math.abs(approx - exact).toDouble / exact
    assert(relErr(row.getAs[Long]("approx_parts"), row.getAs[Long]("exact_parts")) < 0.05)
    assert(relErr(row.getAs[Long]("approx_orders"), row.getAs[Long]("exact_orders")) < 0.05)
  }
}
