package graft.stage

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkTestBase
import graft.core.{Input, Outputs}

/** End-to-end incremental planning over a real filesystem listing:
  * list → plan → execute → runs committed → rerun is a no-op →
  * touched input reruns exactly its output (reference:
  * Stage.scala:221-267 + §3.2 lifecycle).
  */
final class IncrementalSpec extends SparkTestBase {

  private val jobRuns = new AtomicInteger(0)

  private def writeFile(root: String, key: String): Unit = {
    val p = Paths.get(root, key)
    Files.createDirectories(p.getParent)
    Files.write(p, s"data for $key".getBytes)
  }

  test("resourceUri copies a classpath resource once, memoized") {
    val root = tmpDir("res-spec")
    implicit val context: Context = TestMethod.context(spark, root)
    val stage = new TestMethod.TestStage()
    val uri1  = stage.resourceUri("test_upload.txt")
    val uri2  = stage.resourceUri("test_upload.txt")
    assert(uri1 == uri2)
    assert(uri1.endsWith("resources/TestMethod/test_upload.txt"))
    val content = new String(Files.readAllBytes(
      Paths.get(new java.net.URI(uri1).getPath)))
    assert(content.contains("hello graft resource"))
    assertThrows[IllegalArgumentException](stage.resourceUri("nope.txt"))
  }

  test("source rootOverride lists from a different root") {
    val rootA = tmpDir("root-a")
    val rootB = tmpDir("root-b")
    implicit val context: Context = TestMethod.context(spark, rootA)
    writeFile(rootB, "a/foo/part-1")
    val src = Input.Source("a/*/", "part-*", rootOverride = Some(rootB))
    val listed = src.inputs(rootA)(spark)
    assert(listed.map(_.key) == Seq("a/foo/part-1"))
  }

  test("full incremental lifecycle") {
    val root = tmpDir("incr-spec")
    implicit val context: Context = TestMethod.context(spark, root)

    writeFile(root, "a/foo/part-1")
    writeFile(root, "a/foo/part-2")
    writeFile(root, "a/wow/part-1")

    val stage = new Stage() {
      val sourceA = Input.Source("a/*/", "part-*")
      override val sources = Seq(sourceA)
      override val rules: PartialFunction[Input, Outputs] = {
        case sourceA(group, _) => Outputs.Named(group)
      }
      override def make(output: String): SparkJob = SparkJob { (_, env) =>
        jobRuns.incrementAndGet()
        writeFile(root, s"${env.prefix}/${env.method}/${env.stage}/$output/_SUCCESS")
      }
      override def getName: String = "IncrStage"
    }

    context.runs.migrate()
    context.runStatus.migrate()

    // plan: two outputs (foo: 2 inputs, wow: 1 input)
    val work = stage.getWork(new Opts(Seq.empty))
    assert(work.keySet == Set("foo", "wow"))
    assert(work("foo").size == 2)
    assert(work("wow").size == 1)

    // run for real
    stage.run(new Opts(Seq("--yes")))
    assert(jobRuns.get == 2)
    assert(Files.exists(Paths.get(root, "out/TestMethod/IncrStage/foo/_SUCCESS")))
    assert(context.runs.of("IncrStage").size == 3)
    val statuses = context.runStatus.of("IncrStage")
    assert(statuses.size == 2 && statuses.forall(s => s.started.isDefined && s.ended.isDefined))

    // rerun: up to date — no work, no job invocations
    assert(stage.getWork(new Opts(Seq("--yes"))).isEmpty)
    stage.run(new Opts(Seq("--yes")))
    assert(jobRuns.get == 2)

    // touch one input (newer than the recorded run timestamps, but in
    // the past so a fresh run supersedes it): only its output is stale
    val touched = Paths.get(root, "a/wow/part-1")
    Thread.sleep(50)
    Files.setLastModifiedTime(
      touched,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    val work2 = stage.getWork(new Opts(Seq("--yes")))
    assert(work2.keySet == Set("wow"))

    Thread.sleep(50)
    stage.run(new Opts(Seq("--yes")))
    assert(jobRuns.get == 3)
    assert(stage.getWork(new Opts(Seq("--yes"))).isEmpty)

    // --reprocess ignores the runs table entirely
    val reproc = stage.getWork(new Opts(Seq("--reprocess", "--yes")))
    assert(reproc.keySet == Set("foo", "wow"))

    // --insert-runs writes bookkeeping without running jobs
    Thread.sleep(50)
    Files.setLastModifiedTime(
      touched,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    assert(stage.getWork(new Opts(Seq("--yes"))).keySet == Set("wow"))
    Thread.sleep(50)
    stage.run(new Opts(Seq("--yes", "--insert-runs")))
    assert(jobRuns.get == 3) // unchanged
    assert(stage.getWork(new Opts(Seq("--yes"))).isEmpty)
  }
}
