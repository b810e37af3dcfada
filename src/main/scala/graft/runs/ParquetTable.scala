package graft.runs

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, Dataset, Encoder, SaveMode, SparkSession}

/** A tiny MERGE-capable table stored as a parquet directory.
  *
  * Emulates `INSERT ... ON DUPLICATE KEY UPDATE` (reference:
  * Runs.scala:77-103, RunStatus.scala:63-85 via Quill/MySQL) with
  * pure DataFrame ops: `existing ANTI-JOIN incoming-keys UNION
  * incoming`, written to a temp directory and atomically swapped in.
  * On a transactional store (Delta / Iceberg) the same call maps to
  * `MERGE INTO`; the swap is the plain-parquet fallback and is
  * rename-atomic on HDFS/local (documented non-atomic on raw S3 —
  * production deployments would point this at a table format).
  *
  * Writer concurrency: every mutation runs under an exclusive
  * `<path>.lock` file taken with `fs.create(..., overwrite = false)`
  * — an atomic create-if-absent on HDFS/local (and on S3 with
  * conditional writes) — so two concurrent method processes cannot
  * interleave their read-modify-write cycles and silently drop each
  * other's rows (the reference gets the same guarantee per statement
  * from MySQL transactions). Locks carry holder + timestamp; a crash
  * leaves a lock that later writers break after `StaleLockMs`.
  * Readers never lock: the rename swap keeps reads consistent.
  *
  * Rows are typed; keys are column names. The table is run-metadata
  * sized (thousands of rows), but every operation is expressed
  * relationally, so nothing here breaks if it grows by 10^6.
  */
final class ParquetTable[T: Encoder](
    spark: SparkSession,
    val path: String,
    val keyCols: Seq[String]
) {

  import spark.implicits._

  private def fs: FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new Path(path))

  private val lockPath = new Path(path + ".lock")

  /** How long before a lock left by a crashed writer is breakable. */
  private val StaleLockMs = 60000L

  /** How long a writer waits for the lock before giving up loudly. */
  private val LockTimeoutMs = 30000L

  /** Run `body` holding the exclusive writer lock — a per-path JVM
    * monitor (threads sharing this process; the local-FS
    * create-if-absent is not atomic across threads) nested inside
    * the cross-process lock file.
    */
  private def withWriterLock[A](body: => A): A =
    ParquetTable.monitorFor(path).synchronized(withLockFile(body))

  private def withLockFile[A](body: => A): A = {
    val f        = fs
    val deadline = System.currentTimeMillis + LockTimeoutMs
    var held     = false
    while (!held) {
      try {
        // atomic create-if-absent: exactly one contender wins
        val out = f.create(lockPath, false)
        try out.write(
          s"${UUID.randomUUID()} pid=${ProcessHandle.current.pid} ts=${System.currentTimeMillis}"
            .getBytes("UTF-8"))
        finally out.close()
        held = true
      } catch {
        case _: java.io.IOException =>
          // lock held elsewhere: break it if stale, else wait and retry
          val stale =
            try System.currentTimeMillis - f.getFileStatus(lockPath).getModificationTime > StaleLockMs
            catch { case _: java.io.IOException => false } // vanished between create and stat
          if (stale) f.delete(lockPath, false)
          else if (System.currentTimeMillis > deadline)
            throw new IllegalStateException(
              s"timed out after ${LockTimeoutMs}ms waiting for writer lock $lockPath")
          else Thread.sleep(25L + scala.util.Random.nextInt(75))
      }
    }
    try body
    finally fs.delete(lockPath, false)
  }

  /** Idempotent create (reference `migrate()`: CREATE TABLE IF NOT
    * EXISTS, Runs.scala:36-45).
    */
  def migrate(): Unit = withWriterLock {
    if (!exists) writeAtomic(spark.emptyDataset[T])
  }

  def ds: Dataset[T] =
    if (exists) spark.read.parquet(path).as[T]
    else spark.emptyDataset[T]

  def all(): Seq[T] = ds.collect().toSeq

  def isEmpty: Boolean = ds.isEmpty

  /** Upsert: replace any existing row with the same key columns. */
  def upsert(rows: Seq[T]): Unit = {
    if (rows.isEmpty) return
    withWriterLock {
      val incoming = spark.createDataset(rows)
      val kept     = ds.join(incoming.select(keyCols.map(c => $"$c"): _*), keyCols, "left_anti").as[T]
      writeAtomic(kept.unionByName(incoming))
    }
  }

  /** Delete all rows matching the predicate (null-safe: a null
    * predicate result keeps the row).
    */
  def delete(pred: Column): Unit = withWriterLock {
    writeAtomic(ds.filter(!org.apache.spark.sql.functions.coalesce(
      pred, org.apache.spark.sql.functions.lit(false))))
  }

  /** Point update: transform matching rows, keep the rest. */
  def update(pred: Column)(f: T => T): Unit = withWriterLock {
    val matched = ds.filter(pred).collect().toSeq.map(f)
    val rest    = ds.filter(!org.apache.spark.sql.functions.coalesce(
      pred, org.apache.spark.sql.functions.lit(false))).collect().toSeq
    writeAtomic(spark.createDataset(rest ++ matched))
  }

  /** Write-to-temp then swap, so readers never see a half table and a
    * failed write leaves the previous version intact.
    */
  private def writeAtomic(data: Dataset[T]): Unit = {
    val target = new Path(path)
    val tmp    = new Path(path + ".tmp-" + UUID.randomUUID().toString.take(8))
    val trash  = new Path(path + ".old-" + UUID.randomUUID().toString.take(8))
    data.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val f = fs
    if (f.exists(target) && !f.rename(target, trash)) {
      f.delete(tmp, true)
      throw new IllegalStateException(s"cannot swap out $path")
    }
    if (!f.rename(tmp, target)) {
      // restore the previous version before failing
      if (f.exists(trash)) f.rename(trash, target)
      throw new IllegalStateException(s"cannot swap in $path")
    }
    f.delete(trash, true)
  }
}

object ParquetTable {
  private val monitors = scala.collection.concurrent.TrieMap.empty[String, AnyRef]

  private def monitorFor(path: String): AnyRef =
    monitors.getOrElseUpdate(path, new AnyRef)
}
