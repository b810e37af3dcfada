package graft.core

import java.util.Properties

/** Where a method's code came from (source URL, branch, commit),
  * loaded from a properties resource baked into the jar at build time
  * (reference: src/main/scala/.../Provenance.scala:12-34).
  */
final case class Provenance(
    source: Option[String],
    branch: Option[String],
    commit: Option[String]
)

object Provenance {

  val empty: Provenance = Provenance(None, None, None)

  /** Load provenance from a classpath properties resource with keys
    * `remote`, `branch`, `commit` (absent keys become None).
    */
  def fromResource(resource: String): Provenance = {
    val stream = Option(getClass.getClassLoader.getResourceAsStream(resource))
    stream match {
      case None => empty
      case Some(s) =>
        try {
          val props = new Properties()
          props.load(s)
          def get(k: String): Option[String] =
            Option(props.getProperty(k)).map(_.trim).filter(_.nonEmpty)
          Provenance(get("remote"), get("branch"), get("commit"))
        } finally s.close()
    }
  }
}
