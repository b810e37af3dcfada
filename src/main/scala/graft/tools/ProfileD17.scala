package graft.ann

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Phase split of d17_embed_neardup_auto (the round's heaviest
  * non-gate query): the multi-probe SIZING pre-flight (count +
  * sampled catch-rate histogram) vs the MAIN sketch+join pass at the
  * sized table count. Transient; findings land in OPTIMIZATION_r21.md.
  */
object ProfileD17 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.build("profile-d17")
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    try {
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      for (rnd <- 1 to 2) {
        println(s"== round $rnd")
        val (t, pay) = time("sizing_mpAutoTables") {
          val t = Ann.mpAutoTables(vecs, minCos = 0.45, dim = 64, planes = 10, probes = 2)
          (t, true)
        }
        println(s"  tables=$t probesPay=$pay")
        val n1 = time("main_join_pinned") {
          Ann.cosineNearDupPairsLSHMP(vecs, minCos = 0.45, dim = 64, planes = 10,
              tables = t, probes = 2)
            .select(col("a"), col("b"), round(col("sim"), 6).as("sim"))
            .orderBy(col("a"), col("b")).count()
        }
        println(s"  pairs=$n1")
        val n2 = time("full_d17") {
          Ann.cosineNearDupPairsLSH(vecs, minCos = 0.45, dim = 64)
            .select(col("a"), col("b"), round(col("sim"), 6).as("sim"))
            .orderBy(col("a"), col("b")).count()
        }
        println(s"  pairs=$n2")
      }
    } finally spark.stop()
  }
}
