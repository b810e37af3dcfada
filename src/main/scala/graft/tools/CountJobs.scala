package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted, SparkListenerTaskStart}

import graft.GraftSession

/** Load-independent evidence for job-structure optimizations: run a
  * named registry query once (after one warmup) and report how many
  * Spark JOBS, STAGES and TASKS it submits. Per-stage scheduling is
  * the cost that driver-loop queries multiply (guide §2.6/§5), so a
  * removed per-round job shows here even when wall-clock noise at
  * sf0.1 swamps it. Transient; findings land in OPTIMIZATION_r21.md.
  */
object CountJobs {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    val spark = GraftSession.build("count-jobs")
    spark.sparkContext.setLogLevel("OFF")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val detail = sys.env.get("COUNTJOBS_DETAIL").contains("1")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (detail) starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description"))
            .orElse(Option(js.properties.getProperty("callSite.short"))).getOrElse("?")))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (detail) Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
          println(f"  job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e6}%7.1f ms  $desc")
        }
      override def onStageSubmitted(ss: SparkListenerStageSubmitted): Unit = stages.incrementAndGet()
      override def onTaskStart(ts: SparkListenerTaskStart): Unit = tasks.incrementAndGet()
    }
    try {
      for (name <- names) {
        val fn = graft.SparkEntry.queries(name)
        fn(spark, dir).count() // warmup: file-index caches, JIT
        Thread.sleep(300) // let queued listener events drain
        jobs.set(0); stages.set(0); tasks.set(0)
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let queued listener events drain
        spark.sparkContext.removeSparkListener(listener)
        println(f"JOBCOUNT $name jobs=${jobs.get()} stages=${stages.get()} " +
          f"tasks=${tasks.get()} sec=$sec%.2f")
      }
    } finally spark.stop()
  }
}
