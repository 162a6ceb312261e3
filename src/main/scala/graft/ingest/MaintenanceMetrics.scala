package graft.ingest

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Degrade-path observability. The maintenance ticks are designed to
  * run cheap incremental work ([[CommitLog.relayDml]] over a version
  * window, [[MaterializedAgg.refresh]] folding only the delta); the
  * full-state paths ([[CommitLog.reconcileDerived]], the view's
  * snapshot rebuild) exist so misconfigured retention degrades to
  * "expensive, converging" instead of wedging forever.
  *
  * Degrading SILENTLY is its own failure mode: a production pipeline
  * whose source truncation outruns its derived ticks pays a full
  * two-scan repair EVERY tick, and nothing in the output says so —
  * the numbers stay correct while the cost quietly multiplies. Every
  * degrade therefore bumps a per-(dir, topic) counter here and writes
  * one stderr line naming the topic and the cheap path that was
  * bypassed. Tests pin that normally-retained sources NEVER take the
  * degrade path; operators alert on the counter.
  */
object MaintenanceMetrics {

  private val counters = new ConcurrentHashMap[String, AtomicLong]()

  private def bump(kind: String, outDir: String, topic: String): Long = {
    val n = counters
      .computeIfAbsent(s"$kind:$outDir:$topic", _ => new AtomicLong)
      .incrementAndGet()
    System.err.println(
      s"[graft-maintenance] DEGRADE $kind topic=$topic dir=$outDir " +
        s"count=$n — incremental window unreplayable (source truncation " +
        "outran this derivative's tick cadence); running the full-state " +
        "repair. Correct but expensive every tick until retention covers " +
        "the tick interval.")
    n
  }

  /** [[CommitLog.maintainDerived]] fell back to
    * [[CommitLog.reconcileDerived]] for `dstTopic`. */
  private[ingest] def derivedReconcile(outDir: String,
                                       dstTopic: String): Long =
    bump("relay-reconcile", outDir, dstTopic)

  /** [[MaterializedAgg.refresh]] fell back to the snapshot rebuild
    * for `viewTopic`. */
  private[ingest] def viewRebuild(outDir: String, viewTopic: String): Long =
    bump("view-rebuild", outDir, viewTopic)

  /** Degrades recorded for this (kind implicit in the accessor) —
    * the test/alerting surface. Zero when the path never fired. */
  def derivedReconcileCount(outDir: String, dstTopic: String): Long =
    Option(counters.get(s"relay-reconcile:$outDir:$dstTopic"))
      .fold(0L)(_.get())

  def viewRebuildCount(outDir: String, viewTopic: String): Long =
    Option(counters.get(s"view-rebuild:$outDir:$viewTopic"))
      .fold(0L)(_.get())

  /** Drop every counter under `outDir`. The map is process-global
    * and otherwise grows one entry per (dir, topic) forever — a
    * long-lived driver rotating output dirs must release retired
    * dirs, and tests can isolate without minting unique temp dirs. */
  def reset(outDir: String): Unit = {
    val it = counters.keySet.iterator()
    while (it.hasNext) {
      val k = it.next()
      // keys are "<kind>:<outDir>:<topic>"; kind never contains ':'
      // and topic names are charset-gated colon-free, but outDir is
      // an arbitrary path — so a prefix match alone would also drop
      // dirs like "<outDir>:blue". Require the remainder after
      // "<outDir>:" to be a bare (colon-free) topic.
      val rest = k.substring(k.indexOf(':') + 1)
      if (rest.startsWith(outDir + ":") &&
          !rest.substring(outDir.length + 1).contains(':')) it.remove()
    }
  }

  /** Drop ALL counters (test teardown for suites that share dirs). */
  def resetAll(): Unit = counters.clear()
}
