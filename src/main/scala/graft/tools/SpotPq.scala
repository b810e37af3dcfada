package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ann.{Ann, Pq}

/** Decade-scale audit for the IVF·PQ operator (a6): at sf1 (20 k
  * vectors) and sf10 (200 k), measures
  *
  *   1. the operator's EXACTNESS CONTRACT at scale — `ivfPqTopK`
  *      must equal `ivfTopK` over the same learned centroids, with
  *      the rerank budget set by the SAME measured method the gate
  *      config used (tools/TunePq: worst in-cell ADC rank of a true
  *      top-k member, ×2) — i.e. the measured-budget methodology is
  *      shown to TRANSFER across decades, not just hold at sf0.01;
  *   2. the independent baseline — `bruteForceTopK` vs a primitive-
  *      loop driver brute force (the SpotSf10 pattern: no Catalyst,
  *      no shared code with the operator under test);
  *   3. the compression economics — wall time of the ADC full scan
  *      (`pqTopK`) vs the SQ8 scan (`quantizedTopK`) vs the float
  *      brute scan, same query batch, same JVM, identical output
  *      (all three reranked to exactness).
  *
  * Protocol: run alone on an idle host (SCALE.md tier protocol);
  * sf10 wants `SPARK_DRIVER_MEM=96g SPARK_GRAFT_SHUFFLE_PARTITIONS=128`.
  *
  * Run: `sbt "runMain graft.tools.SpotPq testdata-local/sf1"`
  */
object SpotPq {

  private var failures = 0

  private def check(name: String)(ok: => Boolean, detail: => String): Unit = {
    val passed = try ok catch { case e: Exception =>
      println(s"FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}"); failures += 1; return
    }
    if (passed) println(s"PASS $name ($detail)")
    else { println(s"FAIL $name ($detail)"); failures += 1 }
  }

  private def canon(df: DataFrame): Set[Seq[Any]] = df
    .select(col("query_id"), col("nbr_id"), round(col("sim"), 9).as("sim"), col("rank"))
    .collect().map(_.toSeq).toSet

  /** Primitive-loop top-k per query — independent ground truth, the
    * [[SpotSf10.bruteEpsPairs]] discipline: plain double loops on
    * driver-collected arrays, no Catalyst, no shared scoring code.
    */
  private def primitiveTopK(vecs: DataFrame, nQueries: Int, k: Int): Set[(Long, Long)] = {
    val rows = vecs.select(col("id").cast("long"), col("vec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    def norm(v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    val norms = rows.map(r => norm(r._2))
    rows.iterator.takeWhile(_._1 < nQueries).flatMap { case (q, vq) =>
      val nq = norm(vq)
      val best = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
        Ordering.by[(Double, Long), (Double, Long)](x => (-x._1, x._2)))
      var j = 0
      while (j < rows.length) {
        val (b, vb) = rows(j)
        if (b != q) {
          var s = 0.0; var i = 0
          while (i < vq.length) { s += vq(i).toDouble * vb(i).toDouble; i += 1 }
          val sim = s / (nq * norms(j))
          best.enqueue((sim, b))
          if (best.size > k) best.dequeue()
        }
        j += 1
      }
      best.map(e => (q, e._2))
    }.toSet
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: SpotPq <sfDir>")
    val dir = args(0)
    val spark = GraftSession.build("spot-pq")
    val tAll = System.nanoTime()
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    try {
      val m = 16; val ksub = 64; val k = 10; val nQ = 256
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
        .localCheckpoint(eager = true)
      val n = vecs.count()
      val queries = vecs.filter(col("id") < nQ)
      println(s"INFO n=$n queries=$nQ k=$k config m=$m ksub=$ksub")

      // 2. independent baseline
      val primitive = primitiveTopK(vecs, nQ, k)
      val (bruteRes, tBrute) = time(canon(Ann.bruteForceTopK(vecs, queries, k)))
      check("pq_brute_matches_primitive")(
        bruteRes.map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long])) == primitive,
        f"${bruteRes.size} rows vs independent loop [brute $tBrute%.1f s]")

      // 1. exactness contract at scale, rerank set by the measured law
      val books = Pq.trainCodebooks(vecs, m, ksub, iters = 3).localCheckpoint(true)
      val cells = math.max(8, math.round(math.sqrt(n.toDouble / 64)).toInt)
      val cents = Ann.kmeansCentroids(vecs, cells, iters = 2).localCheckpoint(true)
      val (ivfRes, tIvf) = time(canon(Ann.ivfTopK(vecs, queries, cents, k, nprobe = 2)))
      // measured worst in-cell ADC rank of a true ivf top-k member
      val ivfTops = ivfRes.map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long]))
      val cIdx = Ann.ivfAssignments(vecs, cents)
        .join(Pq.encode(vecs, books, m, ksub), Seq("id"))
        .select(col("cell"), col("id").as("nbr_id"), col("codes"), col("nrm").as("cnorm"))
      val qIdx = Pq.probeCells(queries, cents, 2)
        .join(Pq.adcLut(queries, books, m, ksub), Seq("query_id"))
      // rank the probed-cell candidates, then keep ONLY the true
      // top-k pairs before collecting (the full ranked relation is
      // |queries|·|cell| rows — never driver material)
      val topsDf = {
        import spark.implicits._
        ivfTops.toSeq.toDF("query_id", "nbr_id")
      }
      val needed = cIdx.join(broadcast(qIdx), Seq("cell"))
        .filter(col("query_id") =!= col("nbr_id"))
        .withColumn("qsim", graft.functions.PqAdc(col("codes"), col("lut")) / col("cnorm"))
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
            .orderBy(col("qsim").desc, col("nbr_id").asc)))
        .join(broadcast(topsDf), Seq("query_id", "nbr_id"))
        .agg(max(col("r"))).head().getInt(0)
      val rerank = 2 * needed
      println(s"INFO cells=$cells measured worst in-cell ADC rank=$needed -> rerank=$rerank (2x)")
      val (pqIvfRes, tPqIvf) = time(canon(
        Pq.ivfPqTopK(vecs, queries, cents, books, k, m, ksub, nprobe = 2, rerank = rerank)))
      check("pq_ivfpq_equals_ivf_at_measured_budget")(
        pqIvfRes == ivfRes,
        f"${pqIvfRes.size} rows, sims bitwise [ivf $tIvf%.1f s, ivfpq $tPqIvf%.1f s]")

      // 3. compression economics on the full scan, all exact after re-rank
      val fullNeeded = {
        val cIdxF = Pq.encode(vecs, books, m, ksub)
          .join(vecs.select(col("id"),
            graft.functions.VectorOps.fnorm(col("vec")).as("nrm")), Seq("id"))
          .select(col("id").as("nbr_id"), col("codes"), col("nrm").as("cnorm"))
        val qIdxF = Pq.adcLut(queries, books, m, ksub).select(col("query_id"), col("lut"))
        val topsDfF = {
          import spark.implicits._
          primitive.toSeq.toDF("query_id", "nbr_id")
        }
        cIdxF.join(broadcast(qIdxF), col("query_id") =!= col("nbr_id"))
          .withColumn("qsim", graft.functions.PqAdc(col("codes"), col("lut")) / col("cnorm"))
          .withColumn("r", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
              .orderBy(col("qsim").desc, col("nbr_id").asc)))
          .join(broadcast(topsDfF), Seq("query_id", "nbr_id"))
          .agg(max(col("r"))).head().getInt(0)
      }
      println(s"INFO measured worst FULL-SCAN ADC rank=$fullNeeded -> rerank=${2 * fullNeeded} (2x)")
      val (pqRes, tPq) = time(canon(
        Pq.pqTopK(vecs, queries, books, k, m, ksub, rerank = 2 * fullNeeded)))
      val (sqRes, tSq) = time(canon(
        Ann.quantizedTopK(vecs, queries, k, rerank = math.max(64, 2 * fullNeeded))))
      check("pq_fullscan_equals_brute")(pqRes == bruteRes,
        f"adc $tPq%.1f s vs sq8 $tSq%.1f s vs float $tBrute%.1f s, identical output")
      check("pq_sq8_equals_brute")(sqRes == bruteRes, "sq8 arm exact too")

      println(f"== total ${(System.nanoTime() - tAll) / 1e9}%.0f s, failures=$failures")
      if (failures > 0) sys.exit(1)
    } finally spark.stop()
  }
}
