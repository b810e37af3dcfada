package graft.core

/** Wall-clock instrumentation (reference: Util.scala:9-21). */
object Util {
  def time[A](msg: String, doLog: String => Unit = println(_))(body: => A): A = {
    val start = System.currentTimeMillis
    try body
    finally {
      val elapsed = System.currentTimeMillis - start
      doLog(s"$msg took $elapsed ms")
    }
  }
}
