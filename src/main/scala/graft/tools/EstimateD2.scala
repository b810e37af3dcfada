package graft.tools

import graft.GraftSession
import graft.dedup.NgramJaccard

/** Prints [[NgramJaccard.candidateVolume]] for each given sf dir —
  * the pre-flight check that says whether the EXACT n-gram Jaccard
  * join is payable at that scale or the work should go to the
  * MinHash+LSH form instead.
  *
  * Usage: `sbt "runMain graft.tools.EstimateD2 <sfDir> [sfDir...]"`.
  */
object EstimateD2 {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: EstimateD2 <sfDir> [sfDir...]")
    val spark = GraftSession.build("estimate-d2")
    try args.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val row = NgramJaccard.candidateVolume(docs, "doc_id", "text", n = 3, minJaccard = 0.8)
        .collect().head
      println(s"RESULT dir=$dir postings=${row.get(0)} distinct_sh=${row.get(1)} " +
        s"max_posting=${row.get(2)} candidate_volume=${row.get(3)}")
    } finally spark.stop()
  }
}
