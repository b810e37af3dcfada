package graft.stage

import org.scalatest.funsuite.AnyFunSuite

/** Behavior ported from reference OptsTest.scala:8-36. */
final class OptsSpec extends AnyFunSuite {

  test("mutually exclusive flags") {
    assertThrows[ValidationFailure] {
      new Opts(Seq("--insert-runs", "--no-insert-runs"))
    }
  }

  test("dry run") {
    assert(!new Opts(Seq("--yes")).dryRun())
    assert(new Opts(Seq.empty).dryRun())
  }

  test("only and exclude") {
    val opts  = new Opts(Seq("--only", "FG*,T2D*", "--exclude", "*adj*"))
    val tests = Seq("BMI", "FG", "FGadjBMI", "T2D", "T2DadjBMI", "FI", "WHR")

    val onlyTests    = tests.filter(t => opts.onlyGlobs.get.exists(_.matches(t)))
    val excludeTests = tests.filter(t => opts.excludeGlobs.get.exists(_.matches(t)))

    assert(onlyTests.toSet == Set("FG", "FGadjBMI", "T2D", "T2DadjBMI"))
    assert(excludeTests.toSet == Set("FGadjBMI", "T2DadjBMI"))

    val finalTests = onlyTests.filterNot(t => opts.excludeGlobs.get.exists(_.matches(t)))
    assert(finalTests.toSet == Set("FG", "T2D"))
  }

  test("clusters must be positive") {
    assertThrows[ValidationFailure](new Opts(Seq("--clusters", "0")))
    assert(new Opts(Seq("--clusters", "3")).clusters() == 3)
    assert(new Opts(Seq.empty).clusters() == 5)
  }
}
