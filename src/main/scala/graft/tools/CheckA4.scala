package graft.tools

import org.apache.spark.sql.functions._

import graft.ann.Ann

/** Fixture-margin check for the a4 SQ8 gate (AnnSpec covers
  * sf0.001; this sweeps the larger fixtures): quantizedTopK must
  * equal bruteForceTopK at the gate's rerank AND at half of it, so
  * fixture regeneration that erodes the quantized-candidate margin
  * fails here, not as an oracle hash mismatch. Measurement tool, not
  * library surface.
  */
object CheckA4 {
  def main(args: Array[String]): Unit = {
    val sfDirs = if (args.nonEmpty) args.toSeq
                 else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("check-a4", "local[8]", "8")
    spark.sparkContext.setLogLevel("ERROR")
    sfDirs.foreach { d =>
      val vecs = spark.read.parquet(s"$d/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = vecs.filter(col("id") < 20)
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select(col("query_id"), col("nbr_id"), round(col("sim"), 9).as("sim"), col("rank"))
        .collect().map(_.toSeq).toSet
      val exact = canon(Ann.bruteForceTopK(vecs, queries, k = 5))
      Seq(64, 32).foreach { r =>
        val ok = canon(Ann.quantizedTopK(vecs, queries, k = 5, rerank = r)) == exact
        println(s"${d.split('/').last} rerank=$r equalsBruteForce=$ok")
        require(ok, s"a4 margin broken at $d rerank=$r")
      }
    }
    spark.stop()
  }
}
