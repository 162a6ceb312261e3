package graft.ingest

import scala.util.control.NonFatal

/** Bounded retry with fixed backoff — the consumer of the reference's
  * `retry.backoff.ms` knob (`TopicPartitionWriter.java:313-335`: a
  * retriable write failure parks the partition and retries after the
  * backoff instead of failing the task). Here the retried unit is a
  * whole micro-batch write, which is safe to redo because the commit
  * protocol is idempotent (staging overwrites, renames skip existing
  * destinations) — a half-failed attempt converges on the retry. */
object Retry {

  /** Run `f`, retrying up to `attempts` total tries with `backoffMs`
    * sleep between them; rethrows the last failure. `attempts` <= 1
    * means no retry.
    *
    * `IllegalArgumentException` (configuration/validation failures,
    * including `SchemaProjectionException`) is NOT retried — it is
    * deterministic, so a retry only repeats the failed work and delays
    * the identical error. This is the analog of the reference's
    * retriable-vs-fatal exception gate: only environment failures get
    * the backoff path. */
  def withBackoff[T](attempts: Int, backoffMs: Long)(f: => T): T = {
    var tried = 0
    while (true) {
      try return f
      catch {
        case e: IllegalArgumentException => throw e
        case NonFatal(e) =>
          tried += 1
          if (tried >= math.max(1, attempts)) throw e
          if (backoffMs > 0) Thread.sleep(backoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
