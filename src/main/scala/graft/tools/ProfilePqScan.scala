package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ann.{Ann, Pq}
import graft.functions.{PqAdc, VectorOps}

/** Micro-profile of the PQ stage-1 scan vs the float scan — isolates
  * whether the ADC join pays for the per-pair kernel or for copying
  * the 8 KB lut array through the join product.
  */
object ProfilePqScan {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "testdata-local/sf1"
    val spark = GraftSession.build("profile-pq-scan")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    try {
      val m = 16; val ksub = 64
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
        .localCheckpoint(eager = true)
      val queries = vecs.filter(col("id") < 256)
      val books = Pq.trainCodebooks(vecs, m, ksub, iters = 3).localCheckpoint(true)
      val cIdx = Pq.encode(vecs, books, m, ksub)
        .join(vecs.select(col("id"), VectorOps.fnorm(col("vec")).as("cnorm")), Seq("id"))
        .select(col("id").as("nbr_id"), col("codes"), col("cnorm"))
        .localCheckpoint(eager = true)
      val qIdx = Pq.adcLut(queries, books, m, ksub)
        .select(col("query_id"), col("lut")).localCheckpoint(eager = true)
      val qVec = queries.select(col("id").as("query_id"), col("vec").as("qvec"),
        VectorOps.fnorm(col("vec")).as("qnorm")).localCheckpoint(eager = true)
      for (r <- 1 to 2) {
        println(s"== round $r")
        time("float_scan_sum")(
          vecs.join(broadcast(qVec), col("query_id") =!= col("id"))
            .select(sum(VectorOps.fdot(col("vec"), col("qvec")))).head())
        time("adc_scan_sum")(
          cIdx.join(broadcast(qIdx), col("query_id") =!= col("nbr_id"))
            .select(sum(PqAdc(col("codes"), col("lut")))).head())
        time("adc_scan_topk")(
          cIdx.join(broadcast(qIdx), col("query_id") =!= col("nbr_id"))
            .withColumn("qsim", PqAdc(col("codes"), col("lut")) / col("cnorm"))
            .groupBy(col("query_id"))
            .agg(graft.functions.TopKAgg.distinct(col("qsim"), col("nbr_id"), 16).as("t"))
            .select(count(col("t"))).head())
        time("float_scan_topk")(
          vecs.join(broadcast(qVec), col("query_id") =!= col("id"))
            .withColumn("sim", VectorOps.cosinePre(col("vec"), col("qvec"),
              VectorOps.fnorm(col("vec")), col("qnorm")))
            .groupBy(col("query_id"))
            .agg(graft.functions.TopKAgg.distinct(col("sim"), col("id"), 16).as("t"))
            .select(count(col("t"))).head())
      }
    } finally spark.stop()
  }
}

/** Reproduce the full pqTopK cost on the planted corpus. */
object ProfilePqFull {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "testdata-local/sf1"
    val spark = GraftSession.build("profile-pq-full")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    try {
      val m = 16; val ksub = 64
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
        .localCheckpoint(eager = true)
      val planted = SpotTau.plantNearDups(vecs).localCheckpoint(eager = true)
      val books = Pq.trainCodebooks(planted, m, ksub, iters = 3).localCheckpoint(true)
      val qIds = (1000L to 2047L).filter(i => i % 7 == 0).take(256)
      for (r <- 1 to 2) {
        println(s"== round $r")
        val qA = time("queries_isin")(
          planted.filter(col("id").isin(qIds: _*)).localCheckpoint(true))
        time("pq_topk_isin_queries")(
          Pq.pqTopK(planted, planted.filter(col("id").isin(qIds: _*)), books,
            1, m, ksub, 16).count())
        time("pq_topk_checkpointed_queries")(
          Pq.pqTopK(planted, qA, books, 1, m, ksub, 16).count())
        time("pq_topk_lt_queries")(
          Pq.pqTopK(planted, planted.filter(col("id") < 256), books,
            1, m, ksub, 16).count())
      }
    } finally spark.stop()
  }
}

/** Isolate the deferred-evaluation fix: exchange vs checkpoint vs
  * inline between the PqAssign projection and the broadcast join.
  */
object ProfilePqBarrier {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "testdata-local/sf1"
    val spark = GraftSession.build("profile-pq-barrier")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    try {
      val m = 16; val ksub = 64
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
        .localCheckpoint(eager = true)
      val books = Pq.trainCodebooks(vecs, m, ksub, iters = 3).localCheckpoint(true)
      val b = graft.ann.Pq.collectBooks(books, m, ksub)
      val queries = vecs.filter(col("id") < 256)
      val qIdx = Pq.adcLut(queries, books, m, ksub)
        .select(col("query_id"), col("lut")).localCheckpoint(true)
      def cIdxRaw = vecs.select(col("id").as("nbr_id"),
        graft.functions.PqAssign(col("vec"), b.arr, b.present, b.m, b.ksub, b.dsub).as("codes"),
        VectorOps.fnorm(col("vec")).as("cnorm"))
      def scan(cIdx: org.apache.spark.sql.DataFrame) =
        cIdx.join(broadcast(qIdx), col("query_id") =!= col("nbr_id"))
          .withColumn("qsim", PqAdc(col("codes"), col("lut")) / col("cnorm"))
          .groupBy(col("query_id"))
          .agg(graft.functions.TopKAgg.distinct(col("qsim"), col("nbr_id"), 16).as("t"))
          .count()
      for (r <- 1 to 2) {
        println(s"== round $r")
        time("inline")(scan(cIdxRaw))
        time("repartition")(scan(cIdxRaw.repartition(32)))
        time("lazy_checkpoint")(scan(cIdxRaw.localCheckpoint(false)))
      }
    } finally spark.stop()
  }
}

/** Bisect pqTopK: stage-1 alone, stage-1 + rerank, full call. */
object ProfilePqBisect {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "testdata-local/sf1"
    val spark = GraftSession.build("profile-pq-bisect")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    try {
      val m = 16; val ksub = 64
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
        .localCheckpoint(eager = true)
      val books = Pq.trainCodebooks(vecs, m, ksub, iters = 3).localCheckpoint(true)
      val b = graft.ann.Pq.collectBooks(books, m, ksub)
      val queries = vecs.filter(col("id") < 256)
      val cIdx = vecs.select(col("id").as("nbr_id"),
        graft.functions.PqAssign(col("vec"), b.arr, b.present, b.m, b.ksub, b.dsub).as("codes"),
        VectorOps.fnorm(col("vec")).as("cnorm"))
      val qIdx = queries.select(col("id").as("query_id"),
        graft.functions.PqLut(col("vec"), b.arr, b.present, b.m, b.ksub, b.dsub).as("lut"))
      def stage1 = cIdx.join(broadcast(qIdx), col("query_id") =!= col("nbr_id"))
        .withColumn("qsim", PqAdc(col("codes"), col("lut")) / col("cnorm"))
        .groupBy(col("query_id"))
        .agg(graft.functions.TopKAgg.distinct(col("qsim"), col("nbr_id"), 16).as("top"))
        .select(col("query_id"), explode(col("top.tag")).as("nbr_id"))
      for (r <- 1 to 2) {
        println(s"== round $r")
        time("stage1_count")(stage1.count())
        val rr = stage1
          .join(vecs.select(col("id").as("nbr_id"), col("vec").as("cvec"),
            VectorOps.fnorm(col("vec")).as("cnorm")), Seq("nbr_id"))
          .join(broadcast(queries.select(col("id").as("query_id"), col("vec").as("qv"),
            VectorOps.fnorm(col("vec")).as("qnorm"))), Seq("query_id"))
          .withColumn("sim",
            VectorOps.cosinePre(col("qv"), col("cvec"), col("qnorm"), col("cnorm")))
        time("stage1_plus_rerank_count")(rr.count())
        time("full_pqTopK")(Pq.pqTopK(vecs, queries, books, 1, m, ksub, 16).count())
      }
    } finally spark.stop()
  }
}

/** Pin the slow variant: inline vs checkpointed broadcast side. */
object ProfilePqBuild {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "testdata-local/sf1"
    val spark = GraftSession.build("profile-pq-build")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    try {
      val m = 16; val ksub = 64
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
        .localCheckpoint(eager = true)
      val books = Pq.trainCodebooks(vecs, m, ksub, iters = 3).localCheckpoint(true)
      val b = graft.ann.Pq.collectBooks(books, m, ksub)
      val queries = vecs.filter(col("id") < 256)
      val cIdx = vecs.select(col("id").as("nbr_id"),
        graft.functions.PqAssign(col("vec"), b.arr, b.present, b.m, b.ksub, b.dsub).as("codes"),
        VectorOps.fnorm(col("vec")).as("cnorm"))
      val qInline = queries.select(col("id").as("query_id"),
        graft.functions.PqLut(col("vec"), b.arr, b.present, b.m, b.ksub, b.dsub).as("lut"))
      val qCkpt = qInline.localCheckpoint(true)
      def scan(q: org.apache.spark.sql.DataFrame) =
        cIdx.join(broadcast(q), col("query_id") =!= col("nbr_id"))
          .withColumn("qsim", PqAdc(col("codes"), col("lut")) / col("cnorm"))
          .groupBy(col("query_id"))
          .agg(graft.functions.TopKAgg.distinct(col("qsim"), col("nbr_id"), 16).as("t"))
      println("PLAN inline:")
      scan(qInline).queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Project"))
        .take(8).foreach(l => println("  " + l.take(150)))
      println("PLAN ckpt:")
      scan(qCkpt).queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Project"))
        .take(8).foreach(l => println("  " + l.take(150)))
      for (r <- 1 to 2) {
        println(s"== round $r")
        time("scan_inline_q")(scan(qInline).count())
        time("scan_ckpt_q")(scan(qCkpt).count())
      }
    } finally spark.stop()
  }
}

/** One-toggle test: agg.count() vs agg.select(explode(top.tag)).count(). */
object ProfilePqExplode {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "testdata-local/sf1"
    val spark = GraftSession.build("profile-pq-explode")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    try {
      val m = 16; val ksub = 64
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
        .localCheckpoint(eager = true)
      val books = Pq.trainCodebooks(vecs, m, ksub, iters = 3).localCheckpoint(true)
      val b = graft.ann.Pq.collectBooks(books, m, ksub)
      val queries = vecs.filter(col("id") < 256)
      val cIdx = vecs.select(col("id").as("nbr_id"),
        graft.functions.PqAssign(col("vec"), b.arr, b.present, b.m, b.ksub, b.dsub).as("codes"),
        VectorOps.fnorm(col("vec")).as("cnorm"))
      val qIdx = queries.select(col("id").as("query_id"),
        graft.functions.PqLut(col("vec"), b.arr, b.present, b.m, b.ksub, b.dsub).as("lut"))
      val agg = cIdx.join(broadcast(qIdx), col("query_id") =!= col("nbr_id"))
        .withColumn("qsim", PqAdc(col("codes"), col("lut")) / col("cnorm"))
        .groupBy(col("query_id"))
        .agg(graft.functions.TopKAgg.distinct(col("qsim"), col("nbr_id"), 16).as("top"))
      for (r <- 1 to 2) {
        println(s"== round $r")
        time("agg_count")(agg.count())
        time("agg_explode_count")(
          agg.select(col("query_id"), explode(col("top.tag")).as("nbr_id")).count())
      }
    } finally spark.stop()
  }
}

/** Print executed plans for the fast/slow stage-1 variants. */
object ProfilePqPlans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "testdata-local/sf1"
    val spark = GraftSession.build("profile-pq-plans")
    try {
      val m = 16; val ksub = 64
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
        .localCheckpoint(eager = true)
      val books = Pq.trainCodebooks(vecs, m, ksub, iters = 3).localCheckpoint(true)
      val b = graft.ann.Pq.collectBooks(books, m, ksub)
      val queries = vecs.filter(col("id") < 256)
      val cIdx = vecs.select(col("id").as("nbr_id"),
        graft.functions.PqAssign(col("vec"), b.arr, b.present, b.m, b.ksub, b.dsub).as("codes"),
        VectorOps.fnorm(col("vec")).as("cnorm"))
      val qIdx = queries.select(col("id").as("query_id"),
        graft.functions.PqLut(col("vec"), b.arr, b.present, b.m, b.ksub, b.dsub).as("lut"))
      val agg = cIdx.join(broadcast(qIdx), col("query_id") =!= col("nbr_id"))
        .withColumn("qsim", PqAdc(col("codes"), col("lut")) / col("cnorm"))
        .groupBy(col("query_id"))
        .agg(graft.functions.TopKAgg.distinct(col("qsim"), col("nbr_id"), 16).as("top"))
      println("=== PLAN: agg.count()")
      println(agg.groupBy().count().queryExecution.executedPlan.toString.take(3000))
      println("=== PLAN: agg.select(explode)")
      println(agg.select(col("query_id"), explode(col("top.tag")).as("nbr_id"))
        .queryExecution.executedPlan.toString.take(3000))
    } finally spark.stop()
  }
}

/** Which pays: the UDAF or evaluating qsim at all? */
object ProfilePqWho {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "testdata-local/sf1"
    val spark = GraftSession.build("profile-pq-who")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    try {
      val m = 16; val ksub = 64
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
        .localCheckpoint(eager = true)
      val books = Pq.trainCodebooks(vecs, m, ksub, iters = 3).localCheckpoint(true)
      val b = graft.ann.Pq.collectBooks(books, m, ksub)
      val queries = vecs.filter(col("id") < 256)
      val cIdx = vecs.select(col("id").as("nbr_id"),
        graft.functions.PqAssign(col("vec"), b.arr, b.present, b.m, b.ksub, b.dsub).as("codes"),
        VectorOps.fnorm(col("vec")).as("cnorm"))
      val qIdx = queries.select(col("id").as("query_id"),
        graft.functions.PqLut(col("vec"), b.arr, b.present, b.m, b.ksub, b.dsub).as("lut"))
      val joined = cIdx.join(broadcast(qIdx), col("query_id") =!= col("nbr_id"))
        .withColumn("qsim", PqAdc(col("codes"), col("lut")) / col("cnorm"))
      val cCkpt = cIdx.localCheckpoint(true)
      val qCkpt = qIdx.localCheckpoint(true)
      val joinedCkpt = cCkpt.join(broadcast(qCkpt), col("query_id") =!= col("nbr_id"))
        .withColumn("qsim", PqAdc(col("codes"), col("lut")) / col("cnorm"))
      for (r <- 1 to 2) {
        println(s"== round $r")
        time("sum_qsim")(joined.select(sum(col("qsim"))).head())
        time("max_struct")(joined.groupBy(col("query_id"))
          .agg(max(struct(col("qsim"), col("nbr_id"))).as("t"))
          .select(min(col("t.qsim"))).head())
        time("topk_nondistinct")(joined.groupBy(col("query_id"))
          .agg(graft.functions.TopKAgg(col("qsim"), col("nbr_id"), 16).as("top"))
          .select(col("query_id"), explode(col("top.tag"))).count())
        time("topk_distinct")(joined.groupBy(col("query_id"))
          .agg(graft.functions.TopKAgg.distinct(col("qsim"), col("nbr_id"), 16).as("top"))
          .select(col("query_id"), explode(col("top.tag"))).count())
        time("topk_distinct_ckpt_inputs")(joinedCkpt.groupBy(col("query_id"))
          .agg(graft.functions.TopKAgg.distinct(col("qsim"), col("nbr_id"), 16).as("top"))
          .select(col("query_id"), explode(col("top.tag"))).count())
      }
    } finally spark.stop()
  }
}

/** Decisive: partitions + deferral. */
object ProfilePqFix {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "testdata-local/sf1"
    val spark = GraftSession.build("profile-pq-fix")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    try {
      val m = 16; val ksub = 64
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
        .localCheckpoint(eager = true)
      println(s"INFO vecs partitions = ${vecs.rdd.getNumPartitions}")
      val books = Pq.trainCodebooks(vecs, m, ksub, iters = 3).localCheckpoint(true)
      val b = graft.ann.Pq.collectBooks(books, m, ksub)
      val queries = vecs.filter(col("id") < 256)
      def cIdxOf(v: org.apache.spark.sql.DataFrame) = v.select(col("id").as("nbr_id"),
        graft.functions.PqAssign(col("vec"), b.arr, b.present, b.m, b.ksub, b.dsub).as("codes"),
        VectorOps.fnorm(col("vec")).as("cnorm"))
      val qIdx = queries.select(col("id").as("query_id"),
        graft.functions.PqLut(col("vec"), b.arr, b.present, b.m, b.ksub, b.dsub).as("lut"))
        .localCheckpoint(true)
      def sumQ(c: org.apache.spark.sql.DataFrame) =
        c.join(broadcast(qIdx), col("query_id") =!= col("nbr_id"))
          .withColumn("qsim", PqAdc(col("codes"), col("lut")) / col("cnorm"))
          .select(sum(col("qsim"))).head()
      time("inline_1part")(sumQ(cIdxOf(vecs)))
      time("inline_32part")(sumQ(cIdxOf(vecs.repartition(32))))
      time("codes_repart_after")(sumQ(cIdxOf(vecs).repartition(32)))
      time("codes_ckpt")(sumQ(cIdxOf(vecs).localCheckpoint(true)))
    } finally spark.stop()
  }
}
