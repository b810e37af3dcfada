package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ann.{Ann, Pq}

/** Phase-level timing of the a6 dataflow at a given sf dir — which of
  * train / encode / lut / probe actually costs (transient; findings
  * land in SCALE.md and the plan).
  */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.build("profile-pq")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    try {
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      for (round <- 1 to 2) {
        println(s"== round $round")
        val books = time("train")(
          Pq.trainCodebooks(vecs, 16, 64, 3).localCheckpoint(true))
        // consume the computed columns — count() over a bare
        // projection PRUNES it (SCALE.md round 16: Catalyst removes
        // unconsumed expressions/aggregate functions under count, so
        // the "fast" timing measures nothing)
        val codes = time("encode")(Pq.encode(vecs, books, 16, 64)
          .agg(sum(size(col("codes")))).head().getLong(0))
        val lut = time("lut")(
          Pq.adcLut(vecs.filter(col("id") < 20), books, 16, 64)
            .agg(sum(size(col("lut")))).head().getLong(0))
        val cents = time("kmeans8")(
          Ann.kmeansCentroids(vecs, 8, 2).localCheckpoint(true))
        val full = time("ivfPqTopK")(
          Pq.ivfPqTopK(vecs, vecs.filter(col("id") < 20), cents, books,
            5, 16, 64, 2, 96).count())
        val booksLazy = time("train_lazy")(Pq.trainCodebooks(vecs, 16, 64, 3))
        val e2e = time("e2e_like_a6")(
          Pq.ivfPqTopK(vecs, vecs.filter(col("id") < 20), cents, booksLazy,
            5, 16, 64, 2, 96).count())
        println(s"  codes=$codes lut=$lut full=$full e2e=$e2e")
      }
    } finally spark.stop()
  }
}
