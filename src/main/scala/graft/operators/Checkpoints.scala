package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-truncation seam for iterative / self-join operators.
  *
  * `localCheckpoint` (the default) materializes eagerly and cuts the
  * logical plan — right for local runs and short-lived intermediates, and
  * its blocks are released by the ContextCleaner without unpersist
  * bookkeeping. But those blocks carry NO lineage: on a long-running
  * cluster a lost executor makes every downstream stage fail permanently.
  * Operators that pin intermediates therefore take a `reliable` flag;
  * `reliable = true` (requires `sparkContext.setCheckpointDir`) writes a
  * recoverable checkpoint instead — same semantics, survives executor
  * loss, at the cost of a write to the checkpoint filesystem.
  */
object Checkpoints {

  /** PlanAudit's pin seam: `localCheckpoint` truncates lineage, so any
    * audit of a FINAL plan alone is blind to the subplan a pin already
    * executed (a cartesian inside a pinned frame audits as zero). While
    * an observer is installed, every [[pin]] first reports its PRE-pin
    * executed plan string; outside an audit this is `None` and pin pays
    * nothing. Single-audit-process seam (a volatile, not a registry) —
    * the audit tools run queries sequentially. */
  @volatile private var observer: Option[String => Unit] = None

  def observePins[T](cb: String => Unit)(body: => T): T = {
    observer = Some(cb)
    try body finally observer = None
  }

  def pin(df: DataFrame, reliable: Boolean): DataFrame = {
    observer.foreach(cb => cb(df.queryExecution.executedPlan.toString))
    if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(eager = true)
  }
}
