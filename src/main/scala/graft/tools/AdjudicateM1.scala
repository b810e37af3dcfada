package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.multimodal.{MediaDecoder, Multimodal}

/** Round-16 adjudication probe (VERDICT r15 ask #1): m1_media_features
  * is the suite's only >2× identical-code bench line vs the last clean
  * round (0.525/0.59 s vs r13's 0.23 s, persistent across two same-
  * round measurements) — `Multimodal.scala` untouched since the aHash
  * round. Same control-bracketed idle-host protocol that settled
  * a2/a4/c8 last round.
  *
  * Hypothesis under test: `javax.imageio.ImageIO.read(InputStream)`
  * with the JDK-default `ImageIO.getUseCache() == true` backs every
  * read with a `FileCacheImageInputStream` — a TEMP FILE created and
  * deleted in `java.io.tmpdir` PER DECODE CALL. m1 attempts a real
  * decode on every "image"-typed row (~⅓ of the documents table), so
  * one bench run is tens of thousands of temp-file create/unlink
  * syscalls across 32 threads: a cost that (a) is invisible in the
  * plan, (b) scales with filesystem/dentry state rather than data, and
  * (c) would drift between rounds on identical code as /tmp churn
  * accumulates on a long-lived host — exactly m1's signature. The
  * probe A/Bs the decode with the cache on vs off on identical rows;
  * the batch-size knob (`grouped(64)` vs none) is measured alongside
  * because VERDICT named it as the alternative suspect.
  *
  * Layers (the AdjudicateTopK protocol):
  *   - CONTROL: q17_snowflake_join / d4_simhash / e7_ohlc_bars (flat
  *     r13→r15 history) before and after — controls at their priors
  *     mean the host is in the r13 regime and target deltas are code.
  *   - TARGET: the m1 registry query verbatim (what the gate times).
  *   - ARMS: scan head only; stub-only decode (no ImageIO); ImageIO
  *     with useCache=true (the shipping default); ImageIO with
  *     useCache=false; batch shape ungrouped vs grouped(64).
  *
  * Each timing rebuilds its DataFrame from scratch, scrubs cached
  * blocks between probes, and reports warmup + min-of-3.
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.AdjudicateM1
  *       /root/testdata/sf0.1"`
  */
object AdjudicateM1 {

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: AdjudicateM1 <sfDir>")
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build("adjudicate-m1", s"local[$cpus]", cpus)
    spark.conf.set("spark.graft.streamSanityCheck", "false")

    def scrub(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }

    def probe(name: String, build: () => DataFrame, runs: Int = 3): Double = {
      scrub()
      build().count() // warmup: JIT, file-index caches
      val times = Seq.fill(runs) {
        val t0 = System.nanoTime()
        build().count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-28s runs=[${times.map(t => f"$t%.2f").mkString(",")}] min=${times.min}%.3f")
      times.min
    }

    def registry(name: String): () => DataFrame =
      () => graft.SparkEntry.queries(name)(spark, dir)

    def media: DataFrame = Multimodal.synthesize(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")

    // decode arm with an explicit ImageIO cache mode and batch shape.
    // The cache flag must flip on the EXECUTOR threads — local mode
    // shares the JVM, so setting it inside the partition function is
    // both correct here and the honest shape for a cluster.
    def decodeArm(useCache: Boolean, grouped: Boolean): () => DataFrame = () => {
      import spark.implicits._
      media.as[Multimodal.MediaRow].mapPartitions { rows =>
        // force MediaDecoder's object init FIRST: it sets
        // ImageIO.setUseCache(false) once per JVM, and if it ran
        // lazily on the first decode below it would silently reset
        // the cache-ON arm to cache-OFF (the A/B would compare
        // OFF vs OFF and adjudicate "no effect")
        MediaDecoder
        javax.imageio.ImageIO.setUseCache(useCache)
        val it = if (grouped) rows.grouped(64).flatMap(_.iterator) else rows
        it.map(MediaDecoder.decode)
      }.toDF()
        .select(col("media_id"), col("media_type"), col("byte_len"),
          col("width"), col("height"))
        .orderBy(col("media_id"))
    }

    def stubArm: () => DataFrame = () => {
      import spark.implicits._
      media.as[Multimodal.MediaRow].mapPartitions { rows =>
        rows.map(MediaDecoder.decodeStub)
      }.toDF()
        .select(col("media_id"), col("media_type"), col("byte_len"),
          col("width"), col("height"))
        .orderBy(col("media_id"))
    }

    val controls = Seq("q17_snowflake_join", "d4_simhash", "e7_ohlc_bars")

    println(s"=== AdjudicateM1 on $dir, cpus=$cpus, tmpdir=${System.getProperty("java.io.tmpdir")} ===")
    println("--- controls (before) ---")
    controls.foreach(c => probe(s"control:$c", registry(c)))

    println("--- target ---")
    probe("m1:registry", registry("m1_media_features"))

    println("--- arms ---")
    probe("m1:scan-head-only", () => media)
    probe("m1:stub-only-decode", stubArm)
    probe("m1:imageio-cache-ON", decodeArm(useCache = true, grouped = true))
    probe("m1:imageio-cache-OFF", decodeArm(useCache = false, grouped = true))
    probe("m1:cache-OFF-ungrouped", decodeArm(useCache = false, grouped = false))
    probe("m1:cache-ON-ungrouped", decodeArm(useCache = true, grouped = false))

    println("--- controls (after) ---")
    controls.foreach(c => probe(s"control:$c", registry(c)))

    spark.stop()
  }
}
