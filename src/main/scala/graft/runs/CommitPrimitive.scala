package graft.runs

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE atomic primitive the snapshot-manifest commit protocol
  * needs from its store: publish `content` at `path` iff nothing
  * exists there, atomically — a compare-and-swap on file existence.
  *
  * Everything else in [[ParquetTable]] (immutable snapshot dirs,
  * numbered manifests, retention GC) is plain writes and reads; only
  * this operation decides races. Implementations:
  *
  *   - HDFS / local / ABFS: `fs.create(path, overwrite = false)` is
  *     atomic create-if-absent — [[HadoopAtomicCreate]].
  *   - S3-class object stores: a conditional PUT (`If-None-Match: *`,
  *     supported by S3 since 2024, GCS/R2 likewise) — same contract,
  *     different transport; an implementation would call the store's
  *     SDK directly rather than Hadoop's create (which on S3A is NOT
  *     atomic: HADOOP-16490).
  *
  * The reference gets this linearization point from MySQL's
  * transactional INSERT (dig-aggregator-core Db.scala:53); a table
  * format (Delta/Iceberg) gets it from its catalog or log-store
  * conditional write. Modeling it as one pluggable seam means the
  * REST of the protocol is already object-store-ready.
  */
trait CommitPrimitive {

  /** Atomically create `path` with `content` iff absent.
    *
    * @return true — this call created the file (the commit is ours);
    *         false — the path already existed (we lost the race).
    *         Transient store failures throw; only LOSING THE RACE
    *         returns false.
    */
  def createIfAbsent(fs: FileSystem, path: Path, content: Array[Byte]): Boolean
}

object CommitPrimitive {

  /** Default: Hadoop's atomic create-if-absent — correct on HDFS,
    * local FS, and any connector whose `create(overwrite = false)`
    * is atomic.
    */
  object HadoopAtomicCreate extends CommitPrimitive {
    override def createIfAbsent(fs: FileSystem, path: Path,
                                content: Array[Byte]): Boolean =
      try {
        val out = fs.create(path, false)
        try out.write(content)
        finally out.close()
        true
      } catch {
        // every Hadoop FS signals an existing destination as (a
        // subclass of) IOException from the create call itself —
        // the CAS lost; anything thrown past this point (write/close)
        // is a real store failure and propagates
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException        => false
        case e: java.io.IOException
            if Option(e.getMessage).exists(_.toLowerCase.contains("exist")) =>
          false
      }
  }
}
