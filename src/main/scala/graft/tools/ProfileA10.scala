package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.GraftSession
import graft.ann.Pq

/** Phase-level timing of the a10 dataflow (train → stored build →
  * stored laws → served query) at a given sf dir — which phase of
  * the registry's heaviest construction gate actually costs
  * (transient; findings land in OPTIMIZATION_r20.md).
  */
object ProfileA10 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.build("profile-a10")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    try {
      for (rnd <- 1 to 2) {
        println(s"== round $rnd")
        val all = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))
        val cents = all
          .select(col("label").as("cell"), posexplode(col("vec")).as(Seq("pos", "x")))
          .groupBy(col("cell"), col("pos"))
          .agg(round(avg(col("x").cast(DoubleType)), 6).as("m"))
          .groupBy(col("cell"))
          .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
          .select(col("cell"), transform(col("pm"), p => p.getField("m")).as("vec"))
        val vecs = all.select(col("id"), col("vec"))
        val books = time("train")(Pq.trainCodebooks(vecs, m = 16, ksub = 64, iters = 3))
        time("build")(graft.index.IvfPqIndex("pa10_idx", cents, books, m = 16,
          ksub = 64, nBuckets = 4).build(vecs))
        time("laws")(Pq.saveIvfPqLaws(spark, "pa10_idx", measureK = 5, m = 16,
          ksub = 64, sampleN = 32))
        val n = time("serve")(
          Pq.ivfPqTopKIndexedAuto(spark, "pa10_idx", vecs.filter(col("id") < 20),
            k = 5, m = 16, ksub = 64, probeFrac = 1.0, budgetFrac = 1.0)
            .select(col("query_id"), col("nbr_id"),
              round(col("sim"), 6).as("sim"), col("rank"))
            .orderBy(col("query_id"), col("rank")).count())
        println(s"  served rows=$n")
      }
    } finally spark.stop()
  }
}
