package graft

import org.apache.spark.sql.DataFrame

/** Pre-checkpoint plan capture — the PlanShapeSpec lineage-cut
  * blind-spot fix. `localCheckpoint` truncates lineage to an
  * `RDDScanExec`, so a shape sweep over a declared query's executed
  * plan cannot see a cartesian product or an unpartitioned window
  * UPSTREAM of the cut. Every lineage cut in query/operator code
  * therefore goes through [[CutOps.cut]] (or [[record]], for
  * [[graft.operators.Checkpoints]]' reliable-mode branch), which —
  * only while a spec has capture enabled, zero overhead otherwise —
  * records the pre-cut frame plus its site tag so PlanShapeSpec can
  * assert the same shape rules on the hidden side of every cut.
  *
  * `kRowFold = true` declares the ONE sanctioned unpartitioned-window
  * shape: a deliberate `coalesce(1)` ordered fold over a table already
  * aggregated to bin/grain size (k rows, never corpus rows). The spec
  * additionally requires such frames to contain an aggregation in the
  * plan, so the declaration cannot smuggle a corpus-sized window
  * through a cut.
  */
object Cuts {
  final case class Captured(site: String, df: DataFrame, kRowFold: Boolean)

  @volatile private var enabled = false
  private val buf = scala.collection.mutable.ArrayBuffer.empty[Captured]

  /** Spec-only: begin capturing cut sites (clears prior capture). */
  def startCapture(): Unit = synchronized { buf.clear(); enabled = true }

  /** Spec-only: stop capturing and return everything captured. */
  def stopCapture(): Seq[Captured] = synchronized {
    enabled = false; buf.toList
  }

  /** Register a pre-cut frame (no-op unless a spec enabled capture). */
  def record(site: String, df: DataFrame, kRowFold: Boolean = false): Unit =
    if (enabled) synchronized {
      if (enabled) buf += Captured(site, df, kRowFold)
    }

  implicit final class CutOps(private val df: DataFrame) extends AnyVal {
    /** `localCheckpoint` with pre-cut plan registration. Call sites
      * use a stable `site` tag (file:line at introduction) so spec
      * failures point at the cut that hid the offending shape.
      */
    def cut(site: String, eager: Boolean = false,
        kRowFold: Boolean = false): DataFrame = {
      record(site, df, kRowFold)
      df.localCheckpoint(eager)
    }
  }
}
