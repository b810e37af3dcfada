package graft.plans

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Input, Outputs}
import graft.runs.RunRow

/** The incremental planner's dataflow (Stage.buildOutputMap +
  * getWork) expressed relationally over `Dataset`s.
  *
  * The driver-side planner in [[graft.stage.Stage]] is the faithful
  * port for method runs (run metadata is tiny); this module is the
  * same dataflow shaped for the case where the *input listing itself*
  * is big data — hundreds of millions of listed objects — so
  * grouping, the `Outputs.All` broadcast, coverage validation, and
  * the versioned anti-join (SURVEY §2 AGG-4/5/6/7, JN-3) all run as
  * shuffles instead of driver loops. Rules stay an arbitrary Scala
  * function, applied once per input inside a typed `flatMap` (the
  * reference's `PartialFunction` "UDTF", distributed).
  */
object PlannerOps {

  final case class Assignment(output: String, key: String, version: Instant)

  /** Apply rules to every input, producing (output, input) rows.
    * `Outputs.All` inputs are joined against the distinct named
    * outputs (a broadcast of the small output list — the relational
    * form of "append to every output"). `Outputs.Null` inputs are
    * dropped. Returns the assignment table.
    */
  def assignments(inputs: Dataset[Input], rules: Input => Outputs): Dataset[Assignment] = {
    val spark = inputs.sparkSession
    import spark.implicits._

    val named = inputs.flatMap { in =>
      rules(in) match {
        case Outputs.Named(os @ _*) => os.map(o => Assignment(o, in.key, in.version))
        case _                      => Seq.empty
      }
    }
    val allIns = inputs.flatMap { in =>
      rules(in) match {
        case Outputs.All => Seq(in)
        case _           => Seq.empty
      }
    }
    val outputs = named.select($"output").distinct()
    val broadcastAll = allIns
      .join(broadcast(outputs)) // cross join: |outputs| is small
      .select($"output", $"key", $"version")
      .as[Assignment]
    named.unionByName(broadcastAll)
  }

  /** Coverage validation (AGG-6): inputs that are neither assigned to
    * any output nor explicitly `Null`-ignored. Planning should abort
    * (empty work) when this is non-empty — same semantics as
    * Stage.buildOutputMap.
    */
  def uncovered(inputs: Dataset[Input], rules: Input => Outputs): Dataset[Input] = {
    val spark = inputs.sparkSession
    import spark.implicits._
    val covered = assignments(inputs, rules).select($"key").distinct()
    val ignored = inputs.filter(in => rules(in) == Outputs.Null).select($"key")
    inputs
      .join(covered.unionByName(ignored).distinct(), Seq("key"), "left_anti")
      .as[Input]
  }

  /** The versioned anti-join (JN-3): drop assignments whose recorded
    * run timestamp is strictly after the input version (equal
    * timestamps reprocess — reference Stage.scala:256). An equi-join
    * on (output, input key) with a theta residual on the timestamps;
    * Catalyst plans it as a shuffled anti-join on the equi keys with
    * the residual evaluated in place.
    */
  def newWork(assigned: Dataset[Assignment], priorRuns: Dataset[RunRow]): Dataset[Assignment] = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val runs = priorRuns.select(
      $"output".as("r_output"), $"input".as("r_key"), $"timestamp".as("r_ts"))
    assigned
      .join(runs,
        $"output" === $"r_output" && $"key" === $"r_key" && $"r_ts" > $"version",
        "left_anti")
      .as[Assignment]
  }

  /** Per-output input counts (AGG-7) for logging/monitoring. */
  def workCounts(assigned: Dataset[Assignment]): DataFrame =
    assigned.groupBy("output").agg(count(lit(1)).as("n_inputs"))

  /** Full relational getWork: assignments → coverage gate →
    * versioned diff → per-output input sets (AGG-4 collect_set).
    * Returns None when coverage fails (matching the driver planner's
    * empty-map semantics).
    */
  def getWork(inputs: Dataset[Input], rules: Input => Outputs,
              priorRuns: Dataset[RunRow]): Option[DataFrame] = {
    if (!uncovered(inputs, rules).isEmpty) return None
    val work = newWork(assignments(inputs, rules), priorRuns)
    Some(
      work.groupBy("output")
        .agg(collect_set(struct(col("key"), col("version"))).as("inputs"),
          count(lit(1)).as("n_inputs")))
  }
}
