package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.dedup.Clusters

/** Reproduces and measures the iterative-plan statistics blowup.
  *
  * Hypothesis (round 11, found as a driver stall in BigInteger
  * multiply at sf10): `localCheckpoint` carries the ORIGIN plan's
  * Catalyst `sizeInBytes` into the checkpointed LogicalRDD, so a
  * loop that references its previous round k times grows the stat's
  * BIT LENGTH ~k× per round — the BigInt arithmetic itself becomes
  * super-exponential driver work long before any memory limit.
  *
  * Builds a path graph (worst-case CC round count), runs the CC
  * loop, prints per-round sizeInBytes.bitLength + wall time.
  *
  * Usage: `sbt "runMain graft.tools.StatsProbe [nodes]"`.
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 4096L
    val spark = GraftSession.build("stats-probe")
    import spark.implicits._
    try {
      // chain 0-1-2-...-n: diameter n, so min-label CC runs its full
      // O(log n) pointer-jumped rounds
      val edges = spark.range(n - 1)
        .select(col("id").as("a"), (col("id") + 1).as("b"))
      val sym = edges.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(edges.select(col("b").as("src"), col("a").as("dst")))
        .localCheckpoint(eager = true)

      var labels = sym.groupBy(col("src"))
        .agg(least(col("src"), min(col("dst"))).as("label"))
        .select(col("src").as("id"), col("label"))
        .localCheckpoint(true)
      var iter = 0
      var changed = 1L
      while (changed > 0 && iter < 30) {
        val t0 = System.nanoTime()
        val nbrMin = sym
          .join(labels.select(col("id").as("dst"), col("label").as("nlabel")), Seq("dst"))
          .groupBy(col("src")).agg(min(col("nlabel")).as("nbr_label"))
          .select(col("src").as("id"), col("nbr_label"))
        val afterNbr = labels.join(nbrMin, Seq("id"), "left_outer")
          .select(col("id"), col("label").as("old"),
            least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        val next = afterNbr
          .join(afterNbr.select(col("id").as("label"), col("label").as("jump")),
            Seq("label"), "left_outer")
          .select(col("id"), col("old"),
            least(col("label"), coalesce(col("jump"), col("label"))).as("label"))
          .localCheckpoint(true)
        changed = next.filter(col("old") =!= col("label")).count()
        labels = next.select(col("id"), col("label"))
        val bits = labels.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
        println(f"ROUND $iter%2d bits=$bits wall=${(System.nanoTime() - t0) / 1e9}%.2fs changed=$changed")
        iter += 1
      }
      println("PROBE done rounds=" + iter)
      val t0 = System.nanoTime()
      val cc = Clusters.connectedComponents(edges.select(col("a"), col("b")))
      val k = cc.select(countDistinct(col("cluster_rep"))).collect().head.getLong(0)
      println(f"CLUSTERS via Clusters.connectedComponents: $k components in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    } finally spark.stop()
  }
}
