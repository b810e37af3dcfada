package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ann.Ann
import graft.dedup.SemDeDup

/** Measures SemDeDup's cell-count sizing rule at scale.
  *
  * The gated d10 uses the 10 label-mean centroids, so cells grow
  * linearly with the corpus and the in-cell pairwise term grows as
  * n²/cells — the sf10 sweep measured the resulting acceleration
  * (2.8× then 8.8× per decade). SCALE.md's sizing rule says the cell
  * count must scale with n so cells stay bounded; this tool runs the
  * SAME SemDeDup dataflow at a given sf with k-means centroids at
  * several k and prints time + the in-cell pair volume, putting a
  * measured number behind the rule.
  *
  * Usage: `sbt "runMain graft.tools.ScaleD10 <sfDir> [k...]"`.
  */
object ScaleD10 {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleD10 <sfDir> [k...]")
    val dir = args(0)
    val ks  = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(10, 128)
    val spark = GraftSession.build("scale-d10")
    try {
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
        .localCheckpoint(eager = true)
      for (k <- ks) {
        val t0 = System.nanoTime()
        val cents = Ann.kmeansCentroids(vecs, k, iters = 2).localCheckpoint(eager = true)
        val tTrain = (System.nanoTime() - t0) / 1e9
        val volume = Ann.assignCells(vecs, cents)
          .groupBy(col("cell")).agg(count(lit(1)).as("sz"))
          .agg(sum(expr("sz * (sz - 1) DIV 2"))) // integer DIV: exact past double's 2^53
          .collect().head.getLong(0)
        val t1 = System.nanoTime()
        val survivors = SemDeDup.run(vecs, cents, minCos = 0.45).count()
        val tRun = (System.nanoTime() - t1) / 1e9
        println(f"RESULT k=$k train=$tTrain%.1fs run=$tRun%.1fs in_cell_pairs=$volume rows=$survivors")
      }
    } finally spark.stop()
  }
}
