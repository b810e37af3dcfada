package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.stage.Opts

/** End-to-end: synthetic variant JSON → method run → per-ancestry
  * weighted frequencies, checked against the independent SQL form of
  * the weighted mean (`sum(x*n)/sum(n)`), plus incremental no-op on
  * rerun. This is the SURVEY §7 step-6 "minimum end-to-end slice".
  */
final class FrequencyAnalysisSpec extends SparkTestBase {

  private def write(root: String, key: String, lines: Seq[String]): Unit = {
    val p = Paths.get(root, key)
    Files.createDirectories(p.getParent)
    Files.write(p, lines.mkString("\n").getBytes)
  }

  test("frequency analysis end-to-end with incremental rerun") {
    val root = tmpDir("freq-spec")

    def variant(varId: String, ds: String, anc: String, pheno: String,
                eaf: String, maf: String): String =
      s"""{"varId":"$varId","dataset":"$ds","ancestry":"$anc","phenotype":"$pheno","eaf":$eaf,"maf":$maf}"""

    // dataset d1 (N=100): two traits → eaf averaged across traits first
    write(root, "variants/d1/EU/part-00000", Seq(
      variant("v1", "d1", "EU", "t2d", "0.10", "0.10"),
      variant("v1", "d1", "EU", "bmi", "0.30", "0.30"),
      variant("v2", "d1", "EU", "t2d", "NaN", "0.25"),
      variant("v3", "d1", "EU", "t2d", "null", "0.40")
    ))
    write(root, "variants/d1/EU/metadata",
      Seq("""{"name":"d1","samples":100,"ancestry":"EU"}"""))

    // dataset d2 (N=300): one trait
    write(root, "variants/d2/EU/part-00000", Seq(
      variant("v1", "d2", "EU", "t2d", "0.50", "0.50"),
      variant("v2", "d2", "EU", "t2d", "0.20", "0.20")
    ))
    write(root, "variants/d2/EU/metadata",
      Seq("""{"name":"d2","samples":300,"ancestry":"EU"}"""))

    // a second ancestry in its own dataset dir
    write(root, "variants/d3/AF/part-00000", Seq(
      variant("v9", "d3", "AF", "t2d", "0.40", "0.40")
    ))
    write(root, "variants/d3/AF/metadata",
      Seq("""{"name":"d3","samples":50,"ancestry":"AF"}"""))

    // run the whole method for real
    FrequencyAnalysisMethod.runWith(spark, root, Seq("--yes"))

    val eu = spark.read.json(s"$root/out/frequencyanalysis/EU")
    val byVar = eu.collect().map(r =>
      r.getAs[String]("varId") -> (r.getAs[Any]("eaf"), r.getAs[Any]("maf"))).toMap

    // v1: eaf d1 = avg(0.1,0.3)=0.2 (N=100), d2 = 0.5 (N=300)
    //     weighted = (0.2*100 + 0.5*300)/400 = 0.425
    assert(math.abs(byVar("v1")._1.asInstanceOf[Double] - 0.425) < 1e-12)
    assert(math.abs(byVar("v1")._2.asInstanceOf[Double] - 0.425) < 1e-12)

    // v2: eaf — NaN filtered from d1, so only d2: 0.2
    //     maf — (0.25*100 + 0.2*300)/400 = 0.2125
    assert(math.abs(byVar("v2")._1.asInstanceOf[Double] - 0.2) < 1e-12)
    assert(math.abs(byVar("v2")._2.asInstanceOf[Double] - 0.2125) < 1e-12)

    // v3: eaf null in its only dataset → left-outer keeps row, eaf null
    assert(byVar("v3")._1 == null)
    assert(math.abs(byVar("v3")._2.asInstanceOf[Double] - 0.40) < 1e-12)

    // second ancestry written separately
    val af = spark.read.json(s"$root/out/frequencyanalysis/AF")
    assert(af.count() == 1)

    // UDAF result equals the SQL weighted-mean form (AGG-3 cross-check)
    val vars = FrequencyAnalysis.readVariants(spark, root)
    val meta = FrequencyAnalysis.readMetadata(spark, root)
    val n = meta.select(col("name").as("dataset"), col("samples").as("n"))
      .groupBy("dataset").agg(max("n").as("n"))
    val sqlForm = vars
      .filter(col("ancestry") === "EU" && col("eaf").isNotNull && !isnan(col("eaf")))
      .groupBy(col("varId"), col("dataset")).agg(avg("eaf").as("eaf"))
      .join(n, Seq("dataset"))
      .groupBy(col("varId"))
      .agg((sum(col("eaf") * col("n")) / sum(col("n"))).as("eaf"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(sqlForm("v1") - byVar("v1")._1.asInstanceOf[Double]) < 1e-12)

    // rerun: incremental planner reports nothing to do
    val ctx = new graft.stage.Context(
      "frequencyanalysis", "frequencyanalysis", spark, root, root, s"$root/.graft")
    val stage = new FrequencyAnalysisStage()(ctx)
    assert(stage.getWork(new Opts(Seq("--yes"))).isEmpty)
  }
}
