package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ann.Ann

/** Times the brute-force exact ε-graph at a given sf — the
  * feasibility probe for using it as SpotSf10's ground truth
  * (expected ~100× the sf1 time: the broadcast scan is Θ(n²) dots).
  *
  * Usage: `sbt "runMain graft.tools.TimeExact <sfDir> <minCos>"`.
  */
object TimeExact {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: TimeExact <sfDir> <minCos>")
    val spark = GraftSession.build("time-exact")
    try {
      val vecs = spark.read.parquet(s"${args(0)}/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val t0 = System.nanoTime()
      val n = Ann.cosinePairsExact(vecs, args(1).toDouble).count()
      println(f"RESULT pairs=$n time=${(System.nanoTime() - t0) / 1e9}%.1fs")
    } finally spark.stop()
  }
}
