package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.index.TextIndex

/** Phase-level timing of the TextIndex build/serve split that every
  * x-family registry query pays in-query (transient; findings land
  * in OPTIMIZATION_r20.md): plain build, forward build, positional
  * build, then one BM25 serve.
  */
object ProfileText {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.build("profile-text")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    try {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      for (rnd <- 1 to 2) {
        println(s"== round $rnd")
        time("build_plain")(TextIndex("ptx_plain", nBuckets = 4).build(docs))
        time("build_forward")(TextIndex("ptx_fwd", nBuckets = 4, forward = true).build(docs))
        time("build_positional")(TextIndex("ptx_pos", nBuckets = 4, positional = true).build(docs))
        val n = time("serve_bm25")(
          graft.text.Bm25.topKIndexed(spark, "ptx_plain",
            Seq("table", "query", "spark"), k = 20).count())
        println(s"  rows=$n")
      }
      TextIndex("ptx_plain", nBuckets = 4).drop(spark)
      TextIndex("ptx_fwd", nBuckets = 4, forward = true).drop(spark)
      TextIndex("ptx_pos", nBuckets = 4, positional = true).drop(spark)
    } finally spark.stop()
  }
}
