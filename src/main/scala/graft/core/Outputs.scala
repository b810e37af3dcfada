package graft.core

/** How a stage maps one input to the named unit(s) of work that must
  * be (re)built when that input changes.
  *
  * Pure driver-side metadata ADT (reference:
  * src/main/scala/.../Outputs.scala:12-24).
  */
sealed trait Outputs

object Outputs {

  /** The input contributes to every output of the stage. */
  case object All extends Outputs

  /** The input contributes to the explicitly named outputs. */
  final case class Named(seq: String*) extends Outputs

  /** The input is intentionally ignored (not an error). */
  case object Null extends Outputs
}
