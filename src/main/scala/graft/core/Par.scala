package graft.core

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration.Duration

/** Overlap two INDEPENDENT eager Spark constructions on separate
  * driver threads. Spark's scheduler happily runs several jobs at
  * once inside one application — actions are only sequential because
  * driver code calls them sequentially — and a chain of small stages
  * leaves most executor cores idle at every barrier, so a second
  * independent chain back-fills that idle capacity instead of
  * queueing behind it.
  *
  * Contract: the two thunks must have no data dependency, touch no
  * shared session state (no `spark.conf` mutation — the scoped-conf
  * helpers like `Mlt.withBucketedScan` are NOT safe under this), and
  * be deterministic in isolation, so interleaving cannot perturb
  * either result. Failures rethrow on the calling thread.
  */
object Par {
  def par2[A, B](a: => A, b: => B): (A, B) = {
    val fa = Future(a)
    val fb = Future(b)
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
  }
}
