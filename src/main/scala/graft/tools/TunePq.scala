package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ann.{Ann, Pq}

/** Measures, per PQ config, the candidate budget (rerank) the exact
  * gates actually need: for each query, the worst ADC rank of any
  * true top-5 neighbor — over the full corpus (pqTopK's regime) and
  * within 2 probed IVF cells (a6's regime). The gate config must
  * hold the equality with ≥2× slack (the a4 rule), so pick the
  * smallest (m, ksub, iters) whose max-needed-rank ×2 ≤ rerank.
  *
  * Run: sbt "runMain graft.tools.TunePq /root/testdata/sf0.001"
  */
object TunePq {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.build("tune-pq")
    try {
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
        .localCheckpoint(true)
      val queries = vecs.filter(col("id") < 20)
      val exact = Ann.bruteForceTopK(vecs, queries, k = 5)
        .select(col("query_id"), col("nbr_id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val cents = Ann.kmeansCentroids(vecs, k = 8, iters = 2).localCheckpoint(true)
      val ivfExact = Ann.ivfTopK(vecs, queries, cents, k = 5, nprobe = 2)
        .select(col("query_id"), col("nbr_id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

      for (m <- Seq(8, 16); ksub <- Seq(16, 32, 64); iters <- Seq(2, 3)) {
        val books = Pq.trainCodebooks(vecs, m, ksub, iters).localCheckpoint(true)
        // ADC rank of every corpus vector per query, full scan
        val cIdx = Pq.encode(vecs, books, m, ksub)
          .join(vecs.select(col("id"),
            graft.functions.VectorOps.fnorm(col("vec")).as("nrm")), Seq("id"))
          .select(col("id").as("nbr_id"), col("codes"), col("nrm").as("cnorm"))
        val qIdx = Pq.adcLut(queries, books, m, ksub)
          .select(col("query_id"), col("lut"))
        val ranked = cIdx.join(broadcast(qIdx), col("query_id") =!= col("nbr_id"))
          .withColumn("qsim",
            graft.functions.PqAdc(col("codes"), col("lut")) / col("cnorm"))
          .withColumn("r", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
              .orderBy(col("qsim").desc, col("nbr_id").asc)))
          .select(col("query_id"), col("nbr_id"), col("r"))
          .collect()
        val byQ = ranked.groupBy(_.getLong(0))
        val neededFull = exact.map { case (q, tops) =>
          byQ(q).filter(r => tops(r.getLong(1))).map(_.getInt(2)).max
        }.max
        // within probed cells
        val cells = Ann.ivfAssignments(vecs, cents).select(col("cell"), col("id"))
        val probed = Pq.probeCells(queries, cents, 2)
        val ranked2 = cIdx
          .join(cells.select(col("cell"), col("id").as("nbr_id")), Seq("nbr_id"))
          .join(broadcast(probed.join(qIdx, Seq("query_id"))), Seq("cell"))
          .filter(col("query_id") =!= col("nbr_id"))
          .withColumn("qsim",
            graft.functions.PqAdc(col("codes"), col("lut")) / col("cnorm"))
          .withColumn("r", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
              .orderBy(col("qsim").desc, col("nbr_id").asc)))
          .select(col("query_id"), col("nbr_id"), col("r")).collect()
        val byQ2 = ranked2.groupBy(_.getLong(0))
        val neededIvf = ivfExact.map { case (q, tops) =>
          byQ2(q).filter(r => tops(r.getLong(1))).map(_.getInt(2)).max
        }.max
        // the PACKED/no-stored-norm serving ranking (ivfPqTopKIndexed):
        // dot(q, recon(x)) / ‖recon(x)‖ with the norm reconstructed
        // from the codes — the budget law the saved-index spec gates on
        val b = Pq.collectBooks(books, m, ksub)
        val cn2 = typedLit(graft.functions.PqCodec.codeNorms(b.arr, b.dsub).toSeq)
        def reconSim(codes: org.apache.spark.sql.Column) = {
          val packed = graft.functions.PqPack(codes, m, ksub)
          graft.functions.PqAdcPacked(packed, col("lut"), m, ksub) /
            sqrt(greatest(graft.functions.PqAdcPacked(packed, cn2, m, ksub), lit(1e-12)))
        }
        val ranked3 = cIdx
          .join(cells.select(col("cell"), col("id").as("nbr_id")), Seq("nbr_id"))
          .join(broadcast(probed.join(qIdx, Seq("query_id"))), Seq("cell"))
          .filter(col("query_id") =!= col("nbr_id"))
          .withColumn("qsim", reconSim(col("codes")))
          .withColumn("r", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
              .orderBy(col("qsim").desc, col("nbr_id").asc)))
          .select(col("query_id"), col("nbr_id"), col("r")).collect()
        val byQ3 = ranked3.groupBy(_.getLong(0))
        val neededIvfRecon = ivfExact.map { case (q, tops) =>
          byQ3(q).filter(r => tops(r.getLong(1))).map(_.getInt(2)).max
        }.max
        println(f"TUNEPQ m=$m%2d ksub=$ksub%2d iters=$iters  neededFull=$neededFull%3d  " +
          f"neededIvf=$neededIvf%3d  neededIvfRecon=$neededIvfRecon%3d")
      }
    } finally spark.stop()
  }
}
