package graft.plans

import java.time.Instant

import graft.SparkTestBase
import graft.core.{Input, Outputs}
import graft.runs.RunRow

/** The relational planner must agree with the driver-side planner's
  * semantics (grouping, All-broadcast, coverage gate, strictly-after
  * versioned diff).
  */
final class PlannerOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val t0 = Instant.parse("2026-01-01T00:00:00Z")
  private def in(key: String, offsetSec: Long = 0) =
    Input(key, t0.plusSeconds(offsetSec))

  private val rules: Input => Outputs = {
    case i if i.key.startsWith("a/foo/") => Outputs.Named("foo")
    case i if i.key.startsWith("a/bar/") => Outputs.Named("bar")
    case i if i.key.startsWith("all/")   => Outputs.All
    case i if i.key.startsWith("skip/")  => Outputs.Null
    case _                               => Outputs.Named()
  }

  test("assignments: grouping + All broadcast into every output") {
    val inputs = Seq(in("a/foo/1"), in("a/foo/2"), in("a/bar/1"), in("all/x"), in("skip/y")).toDS()
    val asg = PlannerOps.assignments(inputs, rules).collect()
    val byOutput = asg.groupBy(_.output).view.mapValues(_.map(_.key).toSet).toMap
    assert(byOutput("foo") == Set("a/foo/1", "a/foo/2", "all/x"))
    assert(byOutput("bar") == Set("a/bar/1", "all/x"))
    assert(byOutput.keySet == Set("foo", "bar"))
  }

  test("coverage: unmatched inputs are flagged, Null-ignored are not") {
    val inputs = Seq(in("a/foo/1"), in("skip/y"), in("zzz/unmatched")).toDS()
    val bad = PlannerOps.uncovered(inputs, rules).collect().map(_.key).toSet
    assert(bad == Set("zzz/unmatched"))
    assert(PlannerOps.getWork(inputs, rules, spark.emptyDataset[RunRow]).isEmpty)
  }

  test("versioned anti-join: strictly-after drops, ties reprocess") {
    val inputs = Seq(in("a/foo/1", 100), in("a/foo/2", 100), in("a/foo/3", 100)).toDS()
    val asg = PlannerOps.assignments(inputs, rules)
    def run(key: String, tsOffset: Long) =
      RunRow("p", "m", "s", key, t0, "foo", t0.plusSeconds(tsOffset))
    val runs = Seq(
      run("a/foo/1", 200), // after version -> fresh, drop
      run("a/foo/2", 100), // equal -> reprocess
      run("a/foo/3", 50)   // before -> reprocess
    ).toDS()
    val work = PlannerOps.newWork(asg, runs).collect().map(_.key).toSet
    assert(work == Set("a/foo/2", "a/foo/3"))
  }

  test("getWork end-to-end matches the driver-side planner") {
    val inputs = Seq(in("a/foo/1"), in("a/bar/1"), in("all/x")).toDS()
    val work = PlannerOps.getWork(inputs, rules, spark.emptyDataset[RunRow]).get
      .collect().map(r => r.getAs[String]("output") -> r.getAs[Long]("n_inputs")).toMap
    assert(work == Map("foo" -> 2L, "bar" -> 2L))
  }
}
