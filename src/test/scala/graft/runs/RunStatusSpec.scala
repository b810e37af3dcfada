package graft.runs

import graft.SparkTestBase

/** Behavior ported from reference RunsStatusTest.scala:14-86
  * (conflict-reset of started/ended at :56-86).
  */
final class RunStatusSpec extends SparkTestBase {

  private lazy val status =
    new RunStatus(spark, tmpDir("runstatus-spec") + "/runstatus", "test", "TestMethod")

  private val stage = "TestStage"

  test("migrate") {
    status.migrate()
    assert(status.all().isEmpty)
  }

  test("insert/delete - single output") {
    status.migrate()
    status.insert(stage, "o1")
    assert(status.all().size == 1)
    status.delete(stage, "o1")
    assert(status.all().isEmpty)
  }

  test("insert/delete - multiple outputs") {
    status.migrate()
    status.insert(stage, "o1")
    status.insert(stage, "o2")
    val results = status.of(stage)
    assert(results.size == 2)
    assert(results.count(_.output == "o1") == 1)
    assert(results.count(_.output == "o2") == 1)
    status.delete(stage, "o1")
    status.delete(stage, "o2")
    assert(status.all().isEmpty)
  }

  test("update output, removing start / end (conflict reset)") {
    status.migrate()
    status.insert(stage, "o")
    val initial = status.of(stage).filter(_.output == "o")
    assert(initial.length == 1)
    assert(initial.head.started.isEmpty)
    assert(initial.head.ended.isEmpty)

    status.start(stage, "o")
    val started = status.of(stage).filter(_.output == "o")
    assert(started.length == 1)
    assert(started.head.started.isDefined)
    assert(started.head.ended.isEmpty)

    status.end(stage, "o")
    val ended = status.of(stage).filter(_.output == "o")
    assert(ended.length == 1)
    assert(ended.head.started.isDefined)
    assert(ended.head.ended.isDefined)

    // inserting the same output again must blank out started/ended
    status.insert(stage, "o")
    val reset = status.of(stage).filter(_.output == "o")
    assert(reset.length == 1)
    assert(reset.head.started.isEmpty)
    assert(reset.head.ended.isEmpty)

    status.delete(stage, "o")
    assert(status.all().isEmpty)
  }
}
