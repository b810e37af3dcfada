package graft.tools
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.SparkEntry
object CountPairs {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty && args.length % 2 == 0,
      "usage: CountPairs <label> <sfDir> [<label> <sfDir> ...]")
    val spark = GraftSession.build("count-pairs")
    spark.conf.set("spark.graft.streamSanityCheck", "false")
    try {
      for (d <- args.grouped(2).map(_.toSeq); q <- Seq("d5_embed_neardup", "v4_dbscan", "a2_ann_lsh_knn")) {
        d match { case Seq(label, dir) =>
          val t0 = System.nanoTime()
          val n = SparkEntry.queries(q)(spark, dir).count()
          println(f"COUNT $label $q rows=$n t=${(System.nanoTime()-t0)/1e9}%.1f")
        }
      }
    } finally spark.stop()
  }
}
