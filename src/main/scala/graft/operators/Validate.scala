package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (the Deequ/expectations
  * pattern): a check list evaluates over a table in ONE aggregation
  * pass — every check is a conditional aggregate, so the whole
  * report costs a single scan + one reduce regardless of how many
  * checks run, and partials merge associatively at any scale.
  * Uniqueness/referential checks that need their own grouping or
  * join run as separate keyed plans and union into the same report.
  *
  * Output: one row per check — (check, passed, observed, expected)
  * with `observed` the measured count/value — exact integers, so the
  * report itself is oracle-checkable.
  */
object Validate {

  /** A scan-pass check: `name`, a row predicate whose violation
    * count must be ≤ `maxViolations`.
    */
  final case class Check(name: String, violation: Column, maxViolations: Long = 0L)

  /** All scan-pass checks in one aggregation over `df`. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "report needs at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be unique (they become report keys)")
    val aggs = checks.map(c =>
      sum(when(c.violation, 1L).otherwise(0L)).as(c.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.map(c =>
      struct(lit(c.name).as("check"), col(c.name).as("observed"),
        lit(c.maxViolations).as("expected_max")))
    wide.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check").as("check"),
        col("r.observed").as("observed"),
        col("r.expected_max").as("expected_max"),
        (col("r.observed") <= col("r.expected_max")).cast("int").as("passed"))
  }

  /** Key-uniqueness check as a report row: `observed` = number of
    * duplicated key values. One keyed aggregation.
    */
  def uniqueness(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .agg(sum(when(col("n") > 1, 1L).otherwise(0L)).as("observed"))
      .select(lit(name).as("check"), col("observed"),
        lit(0L).as("expected_max"),
        (col("observed") <= 0L).cast("int").as("passed"))

  /** Referential-integrity check: `observed` = count of distinct
    * child keys with no parent (an anti-join, shuffle-on-key).
    */
  def referential(child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String,
                  name: String): DataFrame =
    child.select(col(childKey).as("k")).distinct()
      .join(parent.select(col(parentKey).as("k")).distinct(), Seq("k"), "left_anti")
      .agg(count(lit(1)).as("observed"))
      .select(lit(name).as("check"), col("observed"),
        lit(0L).as("expected_max"),
        (col("observed") <= 0L).cast("int").as("passed"))
}
