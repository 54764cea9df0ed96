package graft.control

/** E1 — error translation (`/root/reference/flusher/manager.py:69-80`):
  * turn source-resolution failures into actionable operator messages
  * written to Last Result.
  */
final case class DocumentNotFound(document: String)
  extends RuntimeException(s"document not found: $document")

final case class WorksheetNotFound(document: String, sheet: String,
    candidates: Seq[String])
  extends RuntimeException(s"worksheet not found: $document/$sheet")

object Errors {
  /** The reference tells the operator to share the spreadsheet with the
    * service account (`manager.py:71-74`); our filesystem-backed source
    * phrases it as a path grant. `identity` is the engine's principal
    * (what a service-account email was in the reference). */
  def translate(e: Throwable, identity: String): String = e match {
    case DocumentNotFound(doc) =>
      s"Could not open document '$doc'. Does it exist, and can '$identity' read it?"
    case WorksheetNotFound(_, sheet, candidates) =>
      s"Could not find sheet '$sheet'. Available sheets: ${candidates.mkString(", ")}"
    case other =>
      Option(other.getMessage).getOrElse(other.getClass.getSimpleName)
  }
}
