package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Input, Outputs}
import graft.functions.WeightedMean
import graft.stage.{Context, Method, SparkJob, Stage}

/** The reference's flagship analytics job re-expressed as one
  * declarative Dataset pipeline (reference:
  * src/main/resources/pipeline/frequencyanalysis/frequencyAnalysis.py).
  *
  * Differences from the PySpark original, by design:
  *   - the two hand-rolled RDD `aggregateByKey` weighted means
  *     (py:55-75) are the [[WeightedMean]] typed Aggregator — Catalyst
  *     plans partial+final hash aggregation, so the extra RDD
  *     shuffles collapse into the group-by shuffle;
  *   - the tiny per-dataset N table (py:31-35) is broadcast
  *     explicitly at the joins (py:54, :66);
  *   - everything else (NaN/null filters py:20-21, avg-across-traits
  *     py:38-51, MAF-drives-left-outer py:78, literal ancestry py:85)
  *     is a 1:1 semantic mapping.
  */
object FrequencyAnalysis {

  /** Compute per-variant weighted EAF/MAF for one ancestry; None when
    * the ancestry has no variants (py:16-17).
    */
  def calcFreq(variants: DataFrame, datasets: DataFrame, ancestry: String): Option[DataFrame] = {
    val forAncestry = variants.filter(col("ancestry") === ancestry)

    if (forAncestry.isEmpty) return None

    val eafRaw = forAncestry.filter(col("eaf").isNotNull && !isnan(col("eaf")))
    val mafRaw = forAncestry.filter(col("maf").isNotNull && !isnan(col("maf")))

    // max samples per dataset across all traits (py:31-35)
    val n = datasets
      .select(col("name").as("dataset"), col("samples").as("n"))
      .groupBy("dataset")
      .agg(max(col("n")).as("n"))

    // average across traits per (variant, dataset) (py:38-51)
    val eafAvg = eafRaw.groupBy(col("varId"), col("dataset")).agg(avg(col("eaf")).as("eaf"))
    val mafAvg = mafRaw.groupBy(col("varId"), col("dataset")).agg(avg(col("maf")).as("maf"))

    // sample-weighted average across datasets (py:55-75)
    val eaf = eafAvg
      .join(broadcast(n), Seq("dataset"))
      .groupBy(col("varId"))
      .agg(WeightedMean(col("eaf"), col("n")).as("eaf"))

    val maf = mafAvg
      .join(broadcast(n), Seq("dataset"))
      .groupBy(col("varId"))
      .agg(WeightedMean(col("maf"), col("n")).as("maf"))

    // MAF should always be present, EAF is optional (py:77-78)
    val comb = maf.join(eaf, Seq("varId"), "left_outer")

    Some(
      comb.select(
        col("varId"),
        col("eaf"),
        col("maf"),
        lit(ancestry).as("ancestry")
      ))
  }

  /** Load the globbed variant part-files (py:109). */
  def readVariants(spark: SparkSession, root: String): DataFrame =
    spark.read.json(s"$root/variants/*/*/part-*")

  /** Load the dataset metadata markers (py:24). */
  def readMetadata(spark: SparkSession, root: String): DataFrame =
    spark.read.json(s"$root/variants/*/*/metadata")
}

/** Stage wiring: inputs are `variants/<dataset>/<ancestry>/` marker
  * objects; each ancestry is one output (the reference submits one
  * EMR job per ancestry — here one [[SparkJob]] per ancestry on the
  * shared session).
  */
class FrequencyAnalysisStage(implicit context: Context) extends Stage {

  val variants: Input.Source = Input.Source.Dataset("variants/*/*/")

  override val sources: Seq[Input.Source] = Seq(variants)

  override val rules: PartialFunction[Input, Outputs] = {
    case variants(_, ancestry) => Outputs.Named(ancestry)
  }

  override def make(output: String): SparkJob = SparkJob { (spark, env) =>
    val vars = FrequencyAnalysis.readVariants(spark, env.inputRoot)
    val meta = FrequencyAnalysis.readMetadata(spark, env.inputRoot)
    FrequencyAnalysis.calcFreq(vars, meta, ancestry = output).foreach { df =>
      df.write.mode("overwrite").json(s"${env.outputRoot}/${env.prefix}/frequencyanalysis/$output")
    }
  }

  override def getName: String = "FrequencyAnalysisStage"
}

object FrequencyAnalysisMethod extends Method {
  override def getName: String = "frequencyanalysis"
  override def initStages(implicit context: Context): Unit =
    addStage(new FrequencyAnalysisStage)
}
