package graft.ann

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.GraftSession

/** Sub-phase timing of the a10 laws + serve phases (transient;
  * findings land in OPTIMIZATION_r21.md): which step of
  * [[Pq.saveIvfPqLaws]] and [[Pq.ivfPqTopKIndexedAuto]] actually
  * costs on a prebuilt index.
  */
object ProfileLaws {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.build("profile-laws")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val m = 16; val ksub = 64
    try {
      val all = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))
      val cents = all
        .select(col("label").as("cell"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(round(avg(col("x").cast(DoubleType)), 6).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), transform(col("pm"), p => p.getField("m")).as("vec"))
      val vecs = all.select(col("id"), col("vec"))
      val books = Pq.trainCodebooks(vecs, m, ksub, iters = 3)
      graft.index.IvfPqIndex("plaws_idx", cents, books, m, ksub, nBuckets = 4).build(vecs)
      val prefix = "plaws_idx"
      for (rnd <- 1 to 2) {
        println(s"== round $rnd")
        val corpus = spark.table(s"${prefix}_vecs").select(col("id"), col("vec"))
        val centroids = spark.table(s"${prefix}_centroids")
        val sample = time("lawsSample")(Pq.lawsSample(spark, prefix, 32))
        val (tops, (nCells, n)) = time("tops_par_counts")(graft.core.Par.par2(
          Ann.bruteForceTopK(corpus, sample, 5)
            .select(col("query_id"), col("nbr_id")).localCheckpoint(true),
          graft.core.Par.par2(centroids.count(), corpus.count())))
        val cellNeeded = time("cellRank_recompute")(
          Pq.measuredCellRankFrom(tops, corpus, sample, centroids))
        val cellNeeded2 = time("cellRank_fromCodes")(
          Pq.measuredCellRankFromCells(tops,
            spark.table(s"${prefix}_codes").select(col("id").as("nbr_id"), col("cell")),
            sample, centroids))
        println(s"  cellRank recompute=$cellNeeded fromCodes=$cellNeeded2 nCells=$nCells n=$n")
        val nprobe = math.min(math.max(1L, 2L * cellNeeded), nCells).toInt
        val (adcNeeded, _) = time("adc_par_reclaim")(graft.core.Par.par2(
          Pq.measuredIndexRankFrom(spark, prefix, tops, sample, m, ksub, nprobe), {
            spark.sql(s"DROP TABLE IF EXISTS ${prefix}_laws")
            graft.index.StoredIndex.reclaimLocation(spark, s"${prefix}_laws")
          }))
        println(s"  adcNeeded=$adcNeeded nprobe=$nprobe")
        time("laws_write_full")(Pq.saveIvfPqLaws(spark, prefix, measureK = 5, m = m,
          ksub = ksub, sampleN = 32))
        // serve sub-phases
        val law = time("serve_law_head")(spark.table(s"${prefix}_laws").head())
        time("serve_buildid")(
          spark.sql(s"SHOW TBLPROPERTIES ${prefix}_codes")
            .filter(col("key") === "graft.build_id").collect())
        val queries = vecs.filter(col("id") < 20)
        val nOut = time("serve_query")(
          Pq.ivfPqTopKIndexed(spark, prefix, queries, k = 5, m = m, ksub = ksub,
              nprobe = law.getAs[Int]("nprobe"),
              rerank = math.max(16, 2 * law.getAs[Int]("adc_rank")))
            .select(col("query_id"), col("nbr_id"), round(col("sim"), 6).as("sim"), col("rank"))
            .orderBy(col("query_id"), col("rank")).count())
        println(s"  served=$nOut")
      }
      graft.index.IvfPqIndex("plaws_idx", cents, books, m, ksub, nBuckets = 4).drop(spark)
    } finally spark.stop()
  }
}
