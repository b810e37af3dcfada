package graft.core

/** String operations over `/`-separated object-store keys.
  *
  * Semantics match the reference's key helpers
  * (reference: src/main/scala/.../Implicits.scala:23-32, spec
  * ImplicitsTest.scala:8-27):
  *
  *   - `basename`     — substring after the last `/` (empty if the key
  *                      ends in `/` or is empty).
  *   - `dirname`      — prefix up to and including the last `/` (empty
  *                      if there is no `/`).
  *   - `commonPrefix` — `dirname` truncated at the first `*`; this is
  *                      the longest literal prefix safe to hand to an
  *                      object-store LIST call before glob-filtering
  *                      client-side (hand-rolled partition pruning).
  */
object paths {

  implicit final class KeyOps(private val key: String) extends AnyVal {

    def basename: String = key.lastIndexOf('/') match {
      case -1 => key
      case n  => key.substring(n + 1)
    }

    def dirname: String = key.lastIndexOf('/') match {
      case -1 => ""
      case n  => key.substring(0, n + 1)
    }

    def commonPrefix: String = dirname.takeWhile(_ != '*')
  }
}
