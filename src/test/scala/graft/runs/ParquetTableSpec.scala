package graft.runs

import java.util.concurrent.Executors

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.hadoop.fs.Path

import graft.SparkTestBase

/** Writer-concurrency protocol of [[ParquetTable]]: mutations are
  * serialized by a lock file (plus a per-path JVM monitor), so
  * interleaved read-modify-write cycles cannot drop each other's
  * rows — the failure mode the reference avoids via MySQL
  * transactions.
  */
final class ParquetTableSpec extends SparkTestBase {
  import spark.implicits._

  private def newTable(name: String): ParquetTable[(String, Long)] =
    new ParquetTable[(String, Long)](spark, tmpDir(name) + "/table", Seq("_1"))

  test("concurrent upserts from many writers lose no rows") {
    val table = newTable("pt-concurrent")
    table.migrate()

    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val writers = (0 until 4).map { w =>
      Future {
        (0 until 3).foreach { i =>
          table.upsert(Seq((s"writer$w-key$i", w * 100L + i)))
        }
      }
    }
    try Await.result(Future.sequence(writers), Duration.Inf)
    finally pool.shutdown()

    // every writer's rows must survive every other writer's cycles
    assert(table.all().toSet ==
      (for (w <- 0 until 4; i <- 0 until 3) yield (s"writer$w-key$i", w * 100L + i)).toSet)
  }

  test("the lock file is released after each mutation") {
    val table = newTable("pt-release")
    table.migrate()
    table.upsert(Seq(("k", 1L)))
    val lock = new Path(table.path + ".lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(lock))
  }

  test("a stale lock left by a crashed writer is broken, not fatal") {
    val table = newTable("pt-stale")
    table.migrate()
    val lock = new Path(table.path + ".lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(lock, false)
    out.write("dead-writer".getBytes("UTF-8"))
    out.close()
    // age it past the stale threshold so the next writer may break it
    fs.setTimes(lock, System.currentTimeMillis - 120000L, -1)

    table.upsert(Seq(("after-crash", 7L)))
    assert(table.all().contains(("after-crash", 7L)))
    assert(!fs.exists(lock))
  }
}
