package graft.stage

import org.apache.spark.sql.SparkSession

import graft.core.{Input, Outputs}

/** Port of the reference test harness (TestMethod.scala:5-30): fake
  * sources under the `a` and `b` prefixes and rules with an
  * `Outputs.All` fallback.
  */
object TestMethod extends Method {

  class TestStage(implicit context: Context) extends Stage {
    val sourceA: Input.Source = Input.Source("a/*/", "*")
    val sourceB: Input.Source = Input.Source("b/*/", "*")

    override val sources: Seq[Input.Source] = Seq.empty

    override def make(output: String): SparkJob = SparkJob.noop

    override val rules: PartialFunction[Input, Outputs] = {
      case sourceA(a, _) => Outputs.Named(a)
      case sourceB(b, _) => Outputs.Named(b)
      case _             => Outputs.All
    }

    override def getName: String = "TestStage"
  }

  override def initStages(implicit context: Context): Unit =
    addStage(new TestStage)

  def context(spark: SparkSession, root: String): Context =
    new Context(
      project = "test",
      methodName = getName,
      spark = spark,
      inputRoot = root,
      outputRoot = root,
      runsRoot = s"$root/.graft"
    )
}
