package graft.runs

import org.apache.hadoop.fs.{FileSystem, Path}

/** Test double of an S3-class conditional PUT (`If-None-Match: *`):
  * the existence check and the publish are made atomic per key by an
  * in-flight register (standing in for the store's strongly
  * consistent metadata CAS), so two concurrent `createIfAbsent` calls
  * on one key always produce exactly one winner — the semantics S3 /
  * GCS / R2 give the real implementation, without Hadoop's
  * `create(overwrite = false)` in the path at all (which on S3A is
  * not atomic, HADOOP-16490).
  *
  * `beforeCas` runs when a caller enters the store but before its
  * conditional PUT is evaluated — the window in which a competing
  * writer's PUT can land first and fail ours with a precondition
  * error — letting specs inject exactly that interleaving.
  */
final class ConditionalPutDouble(
    beforeCas: (FileSystem, Path) => Unit = (_, _) => ())
  extends CommitPrimitive {

  private val inflight =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Calls that lost the CAS to a concurrent in-flight PUT. */
  val racesLost = new java.util.concurrent.atomic.AtomicInteger(0)

  override def createIfAbsent(fs: FileSystem, path: Path,
                              content: Array[Byte]): Boolean = {
    beforeCas(fs, path)
    val key = path.toUri.getPath
    if (!inflight.add(key)) { // concurrent PUT of the same key in flight
      racesLost.incrementAndGet()
      return false
    }
    try {
      if (fs.exists(path)) false // the strongly-consistent existence read
      else {
        val out = fs.create(path, true) // key is owned; clobber any partial
        try out.write(content)
        finally out.close()
        true
      }
    } finally inflight.remove(key)
  }
}
