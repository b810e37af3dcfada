package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** VERDICT r20 #1 adjudication instrument: per-round timing of the
  * connected-components convergence metric read. Measures, for each
  * CC round on the v5 ε-graph, (a) the checkpoint materialization
  * time, (b) the extra wall time `Observation.get` blocks AFTER the
  * checkpoint action returned (the listener-bus delivery wait the
  * verdict hypothesized), and (c) the same metric read through the
  * materializing action's own `QueryExecution.observedMetrics`
  * (accumulator state, no listener involved) — both the value match
  * and its cost. Transient; findings land in OPTIMIZATION_r21.md.
  */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.build("profile-cc")
    spark.sparkContext.setLogLevel("WARN")
    try {
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      // v5's ε-graph (selective τ, LSH path)
      val pairs = graft.ann.Ann.cosineNearDupPairsLSH(vecs, minCos = 0.45,
        dim = 64, planes = 6, tables = 48, probes = 0)
        .select(col("a"), col("b"))
      for (rnd <- 1 to 2) {
        println(s"== round $rnd")
        val base = pairs.select(col("a").cast("long").as("src"), col("b").cast("long").as("dst"))
          .localCheckpoint(true)
        val sym = base.union(base.select(col("dst").as("src"), col("src").as("dst")))
        var labels = sym.groupBy(col("src"))
          .agg(least(col("src"), min(col("dst"))).as("label"))
          .select(col("src").as("id"), col("label"))
          .localCheckpoint(true)
        var changed = 1L
        var iter = 0
        while (changed > 0 && iter < 25) {
          val nbrMin = sym
            .join(labels.select(col("id").as("dst"), col("label").as("nlabel")), Seq("dst"))
            .groupBy(col("src"))
            .agg(min(col("nlabel")).as("nbr_label"))
            .select(col("src").as("id"), col("nbr_label"))
          val afterNbr = labels.join(nbrMin, Seq("id"), "left_outer")
            .select(col("id"), col("label").as("old"),
              least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
          val obs = new org.apache.spark.sql.Observation()
          val observed = afterNbr
            .join(afterNbr.select(col("id").as("label"), col("label").as("jump")),
              Seq("label"), "left_outer")
            .select(col("id"), col("old"),
              least(col("label"), coalesce(col("jump"), col("label"))).as("label"))
            .observe(obs, sum(when(col("old") =!= col("label"), 1L).otherwise(0L))
              .as("changed"))
          val t0 = System.nanoTime()
          val next = graft.plans.Lineage.loopCheckpoint(observed, iter)
          val t1 = System.nanoTime()
          // read the SAME metric from the materializing action's own
          // QueryExecution first (accumulator read, no listener)
          val qeMetric = observed.queryExecution.observedMetrics.get(obs.name)
            .map(_.getAs[Long]("changed"))
          val t2 = System.nanoTime()
          val obsMetric = Option(obs.get("changed")).map {
            case l: java.lang.Long => l.longValue()
            case other => other.toString.toLong
          }.getOrElse(0L)
          val t3 = System.nanoTime()
          println(f"  iter $iter%2d checkpoint ${(t1 - t0) / 1e9}%.3f s  " +
            f"qeMetrics ${(t2 - t1) / 1e9}%.4f s (= ${qeMetric.getOrElse(-1L)})  " +
            f"obs.get ${(t3 - t2) / 1e9}%.4f s (= $obsMetric)")
          changed = obsMetric
          labels = next.select(col("id"), col("label"))
          iter += 1
        }
      }
    } finally spark.stop()
  }
}
