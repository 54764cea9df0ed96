package graft.util

/** X1 — timing instrumentation (`/root/reference/flusher/utils.py:5-25`):
  * the reference decorates functions to log call args + wall time; the
  * idiomatic Scala form is a higher-order wrapper.
  */
object Timed {
  def apply[T](name: String, log: String => Unit = s => System.err.println(s"[timed] $s"))(f: => T): T = {
    val t0 = System.nanoTime()
    try {
      val r = f
      log(f"$name took ${(System.nanoTime() - t0) / 1e9}%.2f secs")
      r
    } catch {
      case e: Throwable =>
        log(f"$name FAILED after ${(System.nanoTime() - t0) / 1e9}%.2f secs: ${e.getMessage}")
        throw e
    }
  }
}
