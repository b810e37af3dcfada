package graft.stage

import graft.core.Glob

/** Raised when CLI flags fail validation (the reference surfaces
  * scallop's ValidationFailure; Opts.scala:49).
  */
final class ValidationFailure(msg: String) extends IllegalArgumentException(msg)

/** Hand-rolled CLI options, same surface and semantics as the
  * reference (Opts.scala:9-79):
  *
  *   --yes             actually run (absent ⇒ dry run / show work)
  *   --test            use the test prefix and store
  *   --reprocess       ignore prior runs, rebuild everything
  *   --insert-runs     only write bookkeeping, run no jobs
  *   --no-insert-runs  run jobs but skip bookkeeping
  *   --show-inputs     log every discovered input
  *   --stage NAME      run a single stage
  *   --only G1,G2      keep outputs matching any glob
  *   --exclude G1,G2   drop outputs matching any glob
  *   --clusters N      max concurrent outputs (default 5, must be > 0)
  */
final class Opts(args: Seq[String]) {

  private val flagSet  = scala.collection.mutable.Set[String]()
  private val valueMap = scala.collection.mutable.Map[String, String]()

  private val takesValue = Set("--stage", "--only", "--exclude", "--clusters")
  private val boolFlags = Set(
    "--yes", "--test", "--reprocess", "--insert-runs", "--no-insert-runs", "--show-inputs")

  locally {
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (takesValue(a)) {
        if (i + 1 >= args.length) throw new ValidationFailure(s"$a requires a value")
        valueMap(a) = args(i + 1)
        i += 2
      } else if (boolFlags(a)) {
        flagSet += a
        i += 1
      } else {
        // unknown flags are rejected, not collected: a mistyped
        // --reproces must not silently change run semantics (the
        // reference's scallop parser rejects unknown options too)
        throw new ValidationFailure(s"unexpected argument: $a")
      }
    }
    if (flagSet("--insert-runs") && flagSet("--no-insert-runs"))
      throw new ValidationFailure("--insert-runs and --no-insert-runs are mutually exclusive")
    if (clusters() <= 0)
      throw new ValidationFailure("--clusters must be > 0")
  }

  def yes(): Boolean          = flagSet("--yes")
  def dryRun(): Boolean       = !yes()
  def test(): Boolean         = flagSet("--test")
  def reprocess(): Boolean    = flagSet("--reprocess")
  def insertRuns(): Boolean   = flagSet("--insert-runs")
  def noInsertRuns(): Boolean = flagSet("--no-insert-runs")
  def showInputs(): Boolean   = flagSet("--show-inputs")
  def stage(): Option[String] = valueMap.get("--stage")
  def clusters(): Int         = valueMap.get("--clusters").map(_.toInt).getOrElse(5)

  private def globs(flag: String): Option[Seq[Glob]] =
    valueMap.get(flag).map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty).map(Glob(_)))

  /** Output-name globs from `--only` (reference: Opts.scala:72-79). */
  def onlyGlobs: Option[Seq[Glob]] = globs("--only")

  /** Output-name globs from `--exclude`. */
  def excludeGlobs: Option[Seq[Glob]] = globs("--exclude")

  /** Whether the `--only`/`--exclude` globs keep this output name:
    * `--only` (when given) must match it, `--exclude` must not.
    */
  def selects(output: String): Boolean =
    onlyGlobs.forall(_.exists(_.matches(output))) &&
      !excludeGlobs.exists(_.exists(_.matches(output)))
}
