package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.dedup.{NgramJaccard, SimHash}

/** Measures SimHash.pairs under SHUFFLE_HASH vs SHUFFLE_MERGE at a
  * given scale — the decision input for the pinned join strategy.
  *
  * Motivation (round 11): at sf1 the d4 stress config with m=4 has a
  * C(16,4)·n ≈ 109 M-row build side; ShuffledHashJoin's per-partition
  * hash relation CANNOT spill, so it dies with SparkOutOfMemoryError
  * once a partition's build side outgrows task execution memory —
  * the same failure a 100 TB run hits whenever data grows faster than
  * the shuffle-partition count. SortMergeJoin sorts and buffers both
  * spillably. This tool puts a number on the price of that safety.
  *
  * Usage: `sbt "runMain graft.tools.TuneSimhashJoin <sfDir> [maxDist] [m...]"`.
  */
object TuneSimhashJoin {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TuneSimhashJoin <sfDir> [maxDist] [m...]")
    val dir     = args(0)
    val maxDist = if (args.length > 1) args(1).toInt else 12
    val ms      = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(3)
    val spark   = GraftSession.build("tune-simhash-join")
    try {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val fps = SimHash.fingerprintsOfTokens(
        docs, "doc_id", NgramJaccard.shingles(col("text"), 3))
        .localCheckpoint(eager = true) // isolate the join under test
      // merge first: a shuffle_hash OOM kills the local JVM (executor
      // OOM is fatal), and the merge numbers should already be out.
      for (m <- ms; hint <- Seq("merge", "shuffle_hash")) {
        // warmup + min-of-2, matching the Bench protocol
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          val res = try Right(SimHash.pairs(fps, maxDist, m, hint).count())
                    catch { case e: Throwable => Left(e.getClass.getSimpleName) }
          (res, (System.nanoTime() - t0) / 1e9)
        }
        val best = times.drop(1).map(_._2).min
        println(f"RESULT maxDist=$maxDist m=$m hint=$hint pairs=${times.last._1} best=$best%.2fs all=${times.map(t => f"${t._2}%.2f").mkString(",")}")
      }
    } finally spark.stop()
  }
}
