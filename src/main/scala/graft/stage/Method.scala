package graft.stage

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.SparkSession

import graft.core.Provenance

/** An ordered pipeline of stages with a name and provenance
  * (reference: Method.scala:14-26). `main` follows the reference
  * lifecycle (§3.1): parse opts → build context → register stages →
  * migrate stores → dry-run gate → run stages in order.
  */
abstract class Method {

  private val stageBuf = ListBuffer[Stage]()

  def getName: String = getClass.getSimpleName.stripSuffix("$")

  def provenance: Provenance = Provenance.fromResource("version.properties")

  /** User code registers stages here (reference: Method.scala:26). */
  def initStages(implicit context: Context): Unit

  protected def addStage(stage: Stage): Unit = stageBuf += stage

  def stages: List[Stage] = stageBuf.toList

  /** Keep a single stage when `--stage` is given (Method.scala:45-54).
    * An unmatched name throws — a typo must not silently select no
    * work (the reference fails the same way via `.find(...).get`).
    */
  def filterStages(opts: Opts): List[Stage] = opts.stage() match {
    case Some(name) =>
      val matched = stages.filter(_.getName == name)
      if (matched.isEmpty)
        throw new NoSuchElementException(
          s"no stage named '$name' in $getName (stages: ${stages.map(_.getName).mkString(", ")})")
      matched
    case None => stages
  }

  /** Reprocess confirmation gate (reference: Method.scala:78-96):
    * a real `--reprocess --yes` run destroys bookkeeping, so prompt
    * on an interactive console; non-interactive runs (no console)
    * proceed — they are assumed scripted and intentional.
    */
  protected def confirmReprocess(opts: Opts): Boolean = {
    if (!(opts.reprocess() && opts.yes())) return true
    val console = System.console()
    if (console == null) true
    else {
      val resp = console.readLine(
        s"Reprocess ALL inputs for $getName? [y/N] ")
      resp != null && resp.trim.equalsIgnoreCase("y")
    }
  }

  /** Run the (filtered) stages sequentially (Method.scala:68-73),
    * timing the whole run (Method.scala:105).
    */
  def run(opts: Opts): Unit = graft.core.Stopwatch.logged(s"Method $getName") {
    if (!confirmReprocess(opts)) return
    filterStages(opts).foreach { stage =>
      if (opts.dryRun()) { stage.showWork(opts); () }
      else stage.run(opts)
    }
  }

  /** Build a context rooted at `root` and execute per the opts. */
  def runWith(spark: SparkSession, root: String, args: Seq[String]): Unit = {
    val opts = new Opts(args)
    val context = new Context(
      project = getName,
      methodName = getName,
      spark = spark,
      inputRoot = root,
      outputRoot = root,
      runsRoot = s"$root/.graft",
      test = opts.test()
    )
    stageBuf.clear()
    initStages(context)
    context.runs.migrate()
    context.runStatus.migrate()
    run(opts)
  }

  def main(args: Array[String]): Unit = {
    val root = sys.env.getOrElse("GRAFT_ROOT", ".")
    val spark = graft.GraftSession.build(s"graft-${getName}")
    try runWith(spark, root, args.toSeq)
    finally spark.stop()
  }
}
