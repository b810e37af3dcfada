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

  test("readers pinned to a snapshot survive a concurrent commit (snapshot isolation)") {
    val table = newTable("pt-isolation")
    table.migrate()
    table.upsert(Seq(("k", 1L)))
    val pinned = table.ds // resolves the CURRENT manifest: an immutable snapshot dir
    table.upsert(Seq(("k", 2L)))
    // the pinned reader still sees its version; a fresh resolve sees the new one
    assert(pinned.collect().toSet == Set(("k", 1L)))
    assert(table.all().toSet == Set(("k", 2L)))
  }

  test("a crashed writer (snapshot written, manifest never committed) changes nothing and is GC'd") {
    val table = newTable("pt-crash")
    table.migrate()
    table.upsert(Seq(("committed", 1L)))
    val root = new Path(table.path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the crash: an orphan snapshot directory with no manifest
    val orphan = new Path(root, "snap-orphan01")
    fs.mkdirs(orphan)
    assert(table.all().toSet == Set(("committed", 1L)), "orphan must be invisible")
    // the next successful commit garbage-collects it
    table.upsert(Seq(("committed", 2L)))
    assert(!fs.exists(orphan), "unreferenced snapshot dirs are GC'd on commit")
    assert(table.all().toSet == Set(("committed", 2L)))
  }

  test("retention: only the last 3 manifests and their snapshots remain") {
    val table = newTable("pt-retain")
    table.migrate()
    (1 to 6).foreach(i => table.upsert(Seq(("k", i.toLong))))
    val root = new Path(table.path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifests = fs.listStatus(new Path(root, "_manifests")).map(_.getPath.getName)
    assert(manifests.length == 3, s"got ${manifests.mkString(",")}")
    val snaps = fs.listStatus(root).map(_.getPath.getName).filter(_.startsWith("snap-"))
    assert(snaps.length == 3, s"got ${snaps.mkString(",")}")
    assert(table.all().toSet == Set(("k", 6L)))
  }

  test("time travel: dsAt reads each retained version exactly as committed") {
    val table = newTable("pt-travel")
    table.migrate()
    table.upsert(Seq(("a", 1L)))               // v2 (migrate committed v1)
    table.upsert(Seq(("a", 2L), ("b", 10L)))   // v3
    table.upsert(Seq(("c", 99L)))              // v4
    val vs = table.versions
    assert(vs.size == 3, s"retained $vs") // KeepManifests = 3
    val Seq(v2, v3, v4) = vs
    assert(table.dsAt(v2).collect().toSet == Set(("a", 1L)))
    assert(table.dsAt(v3).collect().toSet == Set(("a", 2L), ("b", 10L)))
    assert(table.dsAt(v4).collect().toSet == Set(("a", 2L), ("b", 10L), ("c", 99L)))
    // dsAt(latest) agrees with ds
    assert(table.dsAt(v4).collect().toSet == table.ds.collect().toSet)
    // a GC'd or never-committed version fails loud, listing what exists
    val err = intercept[NoSuchElementException](table.dsAt(v2 - 1))
    assert(err.getMessage.contains("garbage-collected"))
  }

  // ---- the pluggable commit primitive (S3-class conditional put) ----

  test("conditional-put primitive: N racing writers, exactly one creates the key") {
    val cp = new ConditionalPutDouble()
    val dir = tmpDir("pt-cas")
    val p = new Path(dir + "/key")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val attempts = (0 until 8).map { i =>
      Future { gate.await(); cp.createIfAbsent(fs, p, s"writer$i".getBytes("UTF-8")) }
    }
    gate.countDown()
    val wins = try Await.result(Future.sequence(attempts), Duration.Inf)
    finally pool.shutdown()
    assert(wins.count(identity) == 1, s"expected exactly one CAS winner, got $wins")
    assert(fs.exists(p))
  }

  test("the full table protocol is green on the conditional-put primitive") {
    val table = new ParquetTable[(String, Long)](
      spark, tmpDir("pt-condput") + "/table", Seq("_1"), new ConditionalPutDouble())
    table.migrate()
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val writers = (0 until 4).map { w =>
      Future {
        (0 until 3).foreach(i => table.upsert(Seq((s"writer$w-key$i", w * 100L + i))))
      }
    }
    try Await.result(Future.sequence(writers), Duration.Inf)
    finally pool.shutdown()
    assert(table.all().toSet ==
      (for (w <- 0 until 4; i <- 0 until 3) yield (s"writer$w-key$i", w * 100L + i)).toSet)
    // time travel still works through the double
    assert(table.versions.nonEmpty)
  }

  test("a manifest race lost mid-commit fails loud and never disturbs committed state") {
    // a competing writer's PUT of the SAME next version lands in the
    // window between our writer reading currentManifest and its
    // conditional put being evaluated — the exact interleaving a
    // broken/stale lock allows on an object store. The competitor
    // (re)commits the previous snapshot, the legal minimal commit.
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val cp = new ConditionalPutDouble((fs, path) => {
      if (path.getName == "v0000000003" && fired.compareAndSet(false, true)) {
        val prev = new Path(path.getParent, "v0000000002")
        val in = fs.open(prev)
        val snap = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        val out = fs.create(path, false)
        try out.write(snap.getBytes("UTF-8")) finally out.close()
      }
    })
    val table = new ParquetTable[(String, Long)](
      spark, tmpDir("pt-race") + "/table", Seq("_1"), cp)
    table.migrate()                    // v1
    table.upsert(Seq(("a", 1L)))       // v2
    val before = table.all().toSet
    val err = intercept[java.util.ConcurrentModificationException] {
      table.upsert(Seq(("b", 2L)))     // tries v3; the hook steals v3 first
    }
    assert(err.getMessage.contains("lost the race"))
    // committed state at v2 is untouched; the loser's snapshot is unreferenced
    assert(table.all().toSet == before)
  }

  test("update() is fenced to metadata scale: wide matches fail loud, table untouched") {
    // update() materializes MATCHED rows on the driver (f is an
    // arbitrary Scala function) — right for runs metadata, an OOM
    // for data-scale tables. The fence turns that misuse into a
    // readable error BEFORE any row is collected or rewritten.
    val table = new ParquetTable[(String, Long)](
      spark, tmpDir("pt-fence") + "/table", Seq("_1"),
      CommitPrimitive.HadoopAtomicCreate, maxUpdateRows = 2L)
    table.migrate()
    table.upsert(Seq(("a", 1L), ("b", 2L), ("c", 3L)))
    val before = table.all().toSet
    val err = intercept[IllegalArgumentException] {
      table.update(org.apache.spark.sql.functions.lit(true)) { case (k, v) => (k, v + 1) }
    }
    assert(err.getMessage.contains("fenced"))
    assert(table.all().toSet == before)
    // under the cap the point update still works, matched-side only
    table.update(org.apache.spark.sql.functions.col("_1") === "a") {
      case (k, v) => (k, v + 10)
    }
    assert(table.all().toSet == Set(("a", 11L), ("b", 2L), ("c", 3L)))
  }
}
