package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

final class ValidateSpec extends SparkTestBase {

  import spark.implicits._

  test("scan checks count violations in one pass and apply tolerances") {
    val df = Seq((1L, 10.0), (2L, -5.0), (3L, 0.0), (4L, 99.0)).toDF("id", "v")
    val got = Validate.report(df, Seq(
        Validate.Check("v_nonneg", col("v") < 0),
        Validate.Check("v_under_50", col("v") > 50),
        Validate.Check("v_under_100_soft", col("v") > 50, maxViolations = 5)))
      .orderBy(col("check"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == Seq(
      ("v_nonneg", 1L, 0L, 0),
      ("v_under_100_soft", 1L, 5L, 1),
      ("v_under_50", 1L, 0L, 0)))
  }

  test("uniqueness counts duplicated key values, not duplicated rows") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "a"), (2L, "b"), (3L, "c"), (3L, "d"))
      .toDF("k", "x")
    val row = Validate.uniqueness(df, "k_unique", Seq("k")).head
    // keys 1 and 3 are duplicated -> observed 2 (not 4 extra rows)
    assert(row.getString(0) == "k_unique" && row.getLong(1) == 2L && row.getInt(3) == 0)
  }

  test("referential reports distinct orphaned child keys") {
    val child  = Seq(1L, 1L, 2L, 5L, 6L, 6L).toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val row = Validate.referential(child, "ck", parent, "pk", "ck_ref").head
    assert(row.getLong(1) == 2L && row.getInt(3) == 0) // orphans: 5, 6
  }

  test("a fully clean table passes everything") {
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val rep = Validate.report(df, Seq(Validate.Check("v_pos", col("v") <= 0)))
      .unionByName(Validate.uniqueness(df, "k_unique", Seq("k")))
    assert(rep.filter(col("passed") === 0).isEmpty)
  }
}
