package graft.stage

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkTestBase
import graft.core.{Input, Outputs}

/** Dependency-driven two-stage method: stage B's source is stage A's
  * `_SUCCESS` markers, so B's work appears only after A runs, and
  * touching an upstream input ripples through both stages on the
  * next run — the reference's core orchestration dataflow
  * (stages chained via Input.Source.Success, Method.scala:68-73).
  */
final class MultiStageSpec extends SparkTestBase {

  private val aRuns = new AtomicInteger(0)
  private val bRuns = new AtomicInteger(0)

  private def writeFile(root: String, key: String): Unit = {
    val p = Paths.get(root, key)
    Files.createDirectories(p.getParent)
    Files.write(p, s"data $key ${System.nanoTime()}".getBytes)
  }

  object PipelineMethod extends Method {
    override def getName: String = "TwoStage"

    class StageA(implicit context: Context) extends Stage {
      val src = Input.Source("raw/*/", "part-*")
      override val sources = Seq(src)
      override val rules: PartialFunction[Input, Outputs] = {
        case src(group, _) => Outputs.Named(group)
      }
      override def make(output: String): SparkJob = SparkJob { (_, env) =>
        aRuns.incrementAndGet()
        writeFile(env.outputRoot, s"${env.prefix}/${env.method}/StageA/$output/data")
        writeFile(env.outputRoot, s"${env.prefix}/${env.method}/StageA/$output/_SUCCESS")
      }
      override def getName: String = "StageA"
    }

    class StageB(implicit context: Context) extends Stage {
      val src = Input.Source.Success(s"out/TwoStage/StageA/*/")
      override val sources = Seq(src)
      override val rules: PartialFunction[Input, Outputs] = {
        case src(group) => Outputs.Named(s"b-$group")
      }
      override def make(output: String): SparkJob = SparkJob { (_, env) =>
        bRuns.incrementAndGet()
        writeFile(env.outputRoot, s"${env.prefix}/${env.method}/StageB/$output/_SUCCESS")
      }
      override def getName: String = "StageB"
    }

    override def initStages(implicit context: Context): Unit = {
      addStage(new StageA)
      addStage(new StageB)
    }
  }

  test("two-stage pipeline: B consumes A's _SUCCESS, incremental ripple") {
    val root = tmpDir("multi-stage")
    writeFile(root, "raw/g1/part-0")
    writeFile(root, "raw/g2/part-0")

    // first full run: A builds g1,g2 then B builds b-g1,b-g2
    PipelineMethod.runWith(spark, root, Seq("--yes"))
    assert(aRuns.get == 2)
    assert(bRuns.get == 2)
    assert(Files.exists(Paths.get(root, "out/TwoStage/StageB/b-g1/_SUCCESS")))

    // rerun: everything up to date, nothing reruns
    Thread.sleep(50)
    PipelineMethod.runWith(spark, root, Seq("--yes"))
    assert(aRuns.get == 2 && bRuns.get == 2)

    // touch one upstream input: A rebuilds g1, whose fresh _SUCCESS
    // makes B rebuild b-g1 in the same sequential run
    Thread.sleep(50)
    writeFile(root, "raw/g1/part-0")
    PipelineMethod.runWith(spark, root, Seq("--yes"))
    assert(aRuns.get == 3, "only g1 should rebuild in A")
    assert(bRuns.get == 3, "only b-g1 should rebuild in B")

    // --stage limits execution to one stage
    Thread.sleep(50)
    writeFile(root, "raw/g2/part-0")
    PipelineMethod.runWith(spark, root, Seq("--yes", "--stage", "StageA"))
    assert(aRuns.get == 4 && bRuns.get == 3)
    // then B catches up alone
    PipelineMethod.runWith(spark, root, Seq("--yes", "--stage", "StageB"))
    assert(bRuns.get == 4)

    // a mistyped --stage name fails loudly instead of running nothing
    assertThrows[NoSuchElementException] {
      PipelineMethod.runWith(spark, root, Seq("--yes", "--stage", "StageZ"))
    }
  }
}
