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
  def pin(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(eager = true)
}
