package graft.stage

import java.time.Instant

import graft.SparkTestBase
import graft.core.{Input, Outputs}

/** Behavior ported from reference StageTest.scala:33-70, plus
  * coverage-validation and only/exclude semantics
  * (Stage.scala:195-214).
  */
final class StageSpec extends SparkTestBase {

  private lazy implicit val context: Context =
    TestMethod.context(spark, tmpDir("stage-spec"))

  private lazy val testStage = new TestMethod.TestStage()

  def input(name: String): Input = Input(name, Instant.now)

  val inputA1 = input("a/foo/bar")
  val inputA2 = input("a/foo/baz")
  val inputB1 = input("b/bar/wow")
  val inputB2 = input("b/bar/ack")
  val inputC1 = input("c/any/all")

  private val opts = new Opts(Seq.empty)

  def testInputToOutput(input: Input, expectedOutput: String): Boolean =
    testStage.rules(input) match {
      case Outputs.Named(seq @ _*) => seq == Seq(expectedOutput)
      case _                       => false
    }

  test("input -> outputs") {
    assert(testInputToOutput(inputA1, "foo"))
    assert(testInputToOutput(inputA2, "foo"))
    assert(testInputToOutput(inputB1, "bar"))
    assert(testInputToOutput(inputB2, "bar"))
  }

  test("all outputs") {
    assert(testStage.rules(inputC1) == Outputs.All)
  }

  test("simple (output -> inputs)") {
    val inputs    = Seq(inputA1, inputA2, inputB1, inputB2)
    val outputMap = testStage.buildOutputMap(inputs, opts)

    assert(outputMap.keys.size == 2)
    assert(outputMap.contains("foo"))
    assert(outputMap.contains("bar"))
    assert(outputMap("foo") == Set(inputA1, inputA2))
    assert(outputMap("bar") == Set(inputB1, inputB2))
  }

  test("all (output -> inputs)") {
    val inputs    = Seq(inputA1, inputB1, inputC1)
    val outputMap = testStage.buildOutputMap(inputs, opts)

    assert(outputMap.keys.size == 2)
    assert(outputMap("foo").contains(inputC1))
    assert(outputMap("bar").contains(inputC1))
  }

  test("coverage validation failure yields empty map, not an exception") {
    // a stage whose rules ignore nothing and miss input "x/..."
    val stage = new TestMethod.TestStage() {
      override val rules: PartialFunction[Input, Outputs] = {
        case i if i.key.startsWith("a/") => Outputs.Named("foo")
        case _                           => Outputs.Named() // named-nothing: not ignored
      }
    }
    val outputMap = stage.buildOutputMap(Seq(inputA1, input("x/unmatched")), opts)
    assert(outputMap.isEmpty)
  }

  test("Null-ignored inputs do not fail coverage") {
    val stage = new TestMethod.TestStage() {
      override val rules: PartialFunction[Input, Outputs] = {
        case i if i.key.startsWith("a/") => Outputs.Named("foo")
        case _                           => Outputs.Null
      }
    }
    val outputMap = stage.buildOutputMap(Seq(inputA1, input("x/skipme")), opts)
    assert(outputMap == Map("foo" -> Set(inputA1)))
  }

  test("only/exclude output filtering") {
    val inputs = Seq(inputA1, inputB1)
    val only   = testStage.buildOutputMap(inputs, new Opts(Seq("--only", "f*")))
    assert(only.keySet == Set("foo"))
    val excl = testStage.buildOutputMap(inputs, new Opts(Seq("--exclude", "f*")))
    assert(excl.keySet == Set("bar"))
  }
}
