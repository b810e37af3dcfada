package graft.stage

import org.apache.spark.sql.SparkSession

import graft.runs.{RunStatus, Runs}

/** Everything a method run needs: the SparkSession (replacing the
  * reference's EMR runner), filesystem roots (replacing its three S3
  * buckets, Method.scala:113-115), and the bookkeeping stores
  * (replacing MySQL; reference Context.scala:8-29).
  */
final class Context(
    val project: String,
    val methodName: String,
    val spark: SparkSession,
    /** Root under which sources list their inputs. */
    val inputRoot: String,
    /** Root under which jobs write outputs. */
    val outputRoot: String,
    /** Directory of the runs/runstatus parquet tables. */
    val runsRoot: String,
    /** Test mode: outputs go under a `test/` prefix (Stage.scala:127). */
    val test: Boolean = false
) {
  lazy val runs: Runs =
    new Runs(spark, s"$runsRoot/runs", project, methodName)

  lazy val runStatus: RunStatus =
    new RunStatus(spark, s"$runsRoot/runstatus", project, methodName)

  /** Output prefix: `out/` normally, `test/` under --test. */
  def outPrefix: String = if (test) "test" else "out"
}

/** The environment handed to a job in place of the reference's
  * EMR env vars (Stage.scala:115-138): JOB_BUCKET→roots,
  * JOB_METHOD/JOB_STAGE/PROJECT→names, JOB_PREFIX→prefix,
  * JOB_DRYRUN→dryRun.
  */
final case class JobEnv(
    project: String,
    method: String,
    stage: String,
    output: String,
    inputRoot: String,
    outputRoot: String,
    prefix: String,
    dryRun: Boolean
) {
  /** Conventional output directory for this job's output. */
  def outDir: String = s"$outputRoot/$prefix/$method/$stage/$output"
}
