package graft.tools

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.streaming.EventsPipeline

/** VERDICT r20 #7 measurement: micro-batch count and per-batch
  * duration breakdown for the streaming queries (s2 sessions, s3/s4
  * stream-stream joins) under Trigger.AvailableNow — is the measured
  * cost dataflow or per-batch scheduling/state-store lifecycle, and
  * how many batches does one run actually execute? Transient;
  * findings land in OPTIMIZATION_r21.md.
  */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.build("profile-stream")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.streamSanityCheck", "false")

    def run(name: String, agg: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
            outputMode: String): Unit = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val t0 = System.nanoTime()
        val q = agg(EventsPipeline.readStream(spark, dir, "events.parquet"))
          .writeStream.outputMode(outputMode).format("memory")
          .queryName(s"ps_${name}_${System.nanoTime()}")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val sec = (System.nanoTime() - t0) / 1e9
        val prog = q.recentProgress
        println(f"PROFILE $name total=$sec%.2f s batches=${prog.length}")
        prog.foreach { p =>
          val d = p.durationMs
          println(s"  batch=${p.batchId} rows=${p.numInputRows} " +
            s"triggerExec=${d.get("triggerExecution")} addBatch=${d.get("addBatch")} " +
            s"getBatch=${d.get("getBatch")} latestOffset=${d.get("latestOffset")} " +
            s"queryPlanning=${d.get("queryPlanning")} walCommit=${d.get("walCommit")} " +
            s"commitOffsets=${d.get("commitOffsets")} " +
            s"stateOps=${p.stateOperators.length}")
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    for (rnd <- 1 to 2) {
      println(s"== round $rnd")
      run("s2_sessions", EventsPipeline.sessionCounts, "complete")
      run("s3_join", st => EventsPipeline.attributionJoin(st, st), "append")
      run("s4_outer", st => EventsPipeline.attributionJoin(st, st, joinType = "left_outer"), "append")
    }
    spark.stop()
  }
}
