package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation policy for iterative operators ([[Components]],
  * [[PageRank]]): every round must cut the logical plan so Catalyst
  * analysis stays O(1) in the iteration count.
  *
  * Two modes:
  *  - default: `localCheckpoint` — executor-local blocks, zero I/O
  *    setup, right for local[32] and for clusters that accept
  *    recompute-from-source on executor loss. NOT recoverable: losing
  *    an executor loses blocks AND the truncated lineage.
  *  - reliable: `checkpoint` to the session's checkpoint directory —
  *    the 100 TB mode (r6 verdict note): rounds survive executor loss
  *    at the cost of one HDFS/object-store write per round. Opt in by
  *    setting BOTH `spark.graft.reliableCheckpoint=true` and
  *    `SparkContext.setCheckpointDir(...)`.
  */
object Checkpoints {
  val ConfKey = "spark.graft.reliableCheckpoint"

  def truncate(df: DataFrame, eager: Boolean = true): DataFrame = {
    val ss = df.sparkSession
    val reliable = ss.conf.get(ConfKey, "false").toBoolean &&
      ss.sparkContext.getCheckpointDir.isDefined
    if (reliable) df.checkpoint(eager) else df.localCheckpoint(eager)
  }
}
