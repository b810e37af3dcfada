package graft.stage

import org.scalatest.funsuite.AnyFunSuite

/** Flag semantics from the reference CLI (OptsTest.scala:8-36),
  * exercised over a service-name domain, plus the strict-parse
  * behavior (unknown flags rejected).
  */
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

  test("unknown or mistyped flags are rejected, not absorbed") {
    assertThrows[ValidationFailure](new Opts(Seq("--reproces")))       // typo of --reprocess
    assertThrows[ValidationFailure](new Opts(Seq("--insert-run")))     // typo of --insert-runs
    assertThrows[ValidationFailure](new Opts(Seq("--frobnicate")))
    assertThrows[ValidationFailure](new Opts(Seq("positional")))
    assertThrows[ValidationFailure](new Opts(Seq("--stage")))          // missing value
  }

  test("only and exclude globs compose") {
    val opts = new Opts(Seq("--only", "api*,batch*", "--exclude", "*-staging"))
    val outputs = Seq("api", "api-staging", "batch-daily", "batch-staging", "web", "cron")

    assert(outputs.filter(opts.selects).toSet == Set("api", "batch-daily"))
    // --only alone
    assert(outputs.filter(new Opts(Seq("--only", "w*")).selects) == Seq("web"))
    // --exclude alone
    assert(outputs.filter(new Opts(Seq("--exclude", "api*")).selects).toSet ==
      Set("batch-daily", "batch-staging", "web", "cron"))
    // neither: everything selected
    assert(outputs.forall(new Opts(Seq.empty).selects))
  }

  test("clusters must be positive") {
    assertThrows[ValidationFailure](new Opts(Seq("--clusters", "0")))
    assert(new Opts(Seq("--clusters", "3")).clusters() == 3)
    assert(new Opts(Seq.empty).clusters() == 5)
  }
}
