package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.streaming.EventsPipeline

/** Measurement harness for the stream-stream join's fixed overhead:
  * times s3 under different shuffle-partition settings (state store
  * count = partitions × 4 for a symmetric hash join). Not part of
  * the library surface.
  */
object TimeS3 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.build("time-s3")
    spark.sparkContext.setLogLevel("ERROR")
    Seq("32", "32", "8", "8", "4", "4").foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p)
      val t0 = System.nanoTime()
      val n = EventsPipeline.runToCompletion(
        spark, sfDir, st => EventsPipeline.attributionJoin(st, st),
        queryName = s"t_${p}_${System.nanoTime()}", glob = "events.parquet",
        outputMode = "append").count()
      println(f"partitions=$p%3s rows=$n elapsed=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
