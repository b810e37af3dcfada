package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ann.Ann

/** Multi-probe vs single-probe near-dup A/B (round 15): for the
  * d-family gate config (τ=0.45, planes=6, dim=64) report, per probe
  * count, the MEASURED per-table catch rate, the recall-budget table
  * count it sizes, the exact candidate volume of that config, the
  * wall time of the full pair join, and — the contract — that the
  * output pair set is IDENTICAL to the single-probe join's. The
  * single-probe row is the d17 baseline (analytic sizing).
  *
  * Protocol mirrors AdjudicateTopK: scrub between probes, warmup +
  * min-of-3, report host load so a contaminated run is self-evident.
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.TuneMp
  *       /root/testdata/sf0.1"`
  */
object TuneMp {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TuneMp <sfDir> [minCos] [planes] [--plant]")
    val dir = args(0)
    val flags = args.drop(1)
    val plant = flags.contains("--plant")
    val nums = flags.filterNot(_.startsWith("--"))
    val minCos = if (nums.length > 0) nums(0).toDouble else 0.45
    val planes = if (nums.length > 1) nums(1).toInt else 6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build("tune-mp", s"local[$cpus]", cpus)
    val dim = 64

    def loadAvg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0)
      catch { case _: Throwable => "?" }

    // --plant: overlay SpotTau's deterministic near-dup tail (cos≈0.93
    // dups + cos≈0.86 siblings) so a selective τ has true pairs to
    // find — the regime every REAL near-dup corpus is in and the
    // isotropic generator deliberately lacks
    // materialized to a temp parquet, not a localCheckpoint: the scrub
    // between timed probes unpersists every block, and a truncated-
    // lineage checkpoint cannot recompute
    lazy val plantedPath = {
      val p = java.nio.file.Files.createTempDirectory("tunemp_planted").toString
      SpotTau.plantNearDups(
          spark.read.parquet(s"$dir/embeddings.parquet")
            .select(col("vec_id").as("id"), col("embedding").as("vec")))
        .write.mode("overwrite").parquet(p)
      p
    }
    def embeddings: DataFrame =
      if (plant) spark.read.parquet(plantedPath)
      else spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))

    def scrub(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }

    def time(build: () => DataFrame): Double = {
      scrub()
      build().count()
      Seq.fill(3) {
        val t0 = System.nanoTime()
        build().count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    println(s"== TuneMp $dir minCos=$minCos planes=$planes load=${loadAvg()} ==")
    val n = embeddings.count()
    val est = Ann.estimatePairCount(embeddings, minCos)
    println(f"n=$n est_pairs=$est%.0f")

    val tSingle = Ann.autoTables(embeddings, minCos, planes)
    val volS = Ann.lshCandidateVolume(embeddings, dim, planes, tSingle).collect().head
    val tsS = time(() => Ann.cosineNearDupPairsLSH(embeddings, minCos, dim, planes, tSingle))
    val spSet = Ann.cosineNearDupPairsLSH(embeddings, minCos, dim, planes, tSingle)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"single-probe: T=$tSingle emissions=${volS.getAs[Long]("bucket_rows")} " +
      f"cands=${volS.getAs[Long]("candidate_volume")} max_bucket=${volS.getAs[Long]("max_bucket")} " +
      f"pairs=${spSet.size} time=$tsS%.2f s")

    for (probes <- Seq(1, 2, 3)) {
      val (rate, catches, trials) = Ann.mpCatchRate(embeddings, minCos, dim, planes, probes)
      val t0 = System.nanoTime()
      val tMp = Ann.mpAutoTables(embeddings, minCos, dim, planes, probes)
      val sizingS = (System.nanoTime() - t0) / 1e9
      val volM = Ann.mpCandidateVolume(embeddings, dim, planes, tMp, probes).collect().head
      // pinned-T timing on BOTH sides: the auto sizing is a once-per-
      // corpus pre-flight, not a per-join cost — report it separately
      val tsM = time(() => Ann.cosineNearDupPairsLSHMP(embeddings, minCos, dim, planes, tMp, probes))
      val mpSet = Ann.cosineNearDupPairsLSHMP(embeddings, minCos, dim, planes, tMp, probes)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val eq = if (mpSet == spSet) "EQUAL" else
        s"DIFF missing=${(spSet -- mpSet).size} extra=${(mpSet -- spSet).size}"
      println(f"mp probes=$probes: catch=$rate%.4f ($catches/$trials) T=$tMp " +
        f"emissions=${volM.getAs[Long]("bucket_rows")} cands=${volM.getAs[Long]("candidate_volume")} " +
        f"max_bucket=${volM.getAs[Long]("max_bucket")} pairs=${mpSet.size} " +
        f"time=$tsM%.2f s sizing=$sizingS%.2f s  $eq")
    }
    println(s"== done load=${loadAvg()} ==")
    spark.stop()
  }
}
