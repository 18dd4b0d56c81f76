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
  *    `SparkContext.setCheckpointDir(...)`. The frame is persisted
  *    BEFORE checkpointing (the standard pairing): Spark's reliable
  *    checkpoint writes files in a SECOND job, which would otherwise
  *    recompute the whole round's plan; with the persist, the write
  *    job reads cached blocks. Eager cuts unpersist right after the
  *    write; lazy cuts stay persisted until materialization (the
  *    caller's next action), then the blocks are redundant and
  *    LRU-evictable — bounded at one round's frame.
  */
object Checkpoints {
  val ConfKey = "spark.graft.reliableCheckpoint"

  // Reliable + lazy mode: round N's pre-checkpoint persist is needed
  // only until round N's checkpoint materializes (the caller's next
  // action, e.g. the convergence count in Components). MEMORY_AND_DISK
  // eviction spills rather than drops, so without an explicit release
  // the persisted round frames accumulate across iterations — exactly
  // in the 100 TB mode this feature targets. Track the last lazy
  // persist per session and release it on the FOLLOWING truncate call,
  // by which point its checkpoint has materialized. The frame is a
  // plain persist with intact lineage, so a premature unpersist (e.g.
  // two iterative operators interleaving on one session) costs at most
  // a recompute, never correctness. Live blocks stay bounded at one
  // round's frame per session.
  private val lastLazyPersist =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  def truncate(df: DataFrame, eager: Boolean = true): DataFrame = {
    graft.Cuts.record("Checkpoints.truncate", df)
    val ss = df.sparkSession
    val reliable = ss.conf.get(ConfKey, "false").toBoolean &&
      ss.sparkContext.getCheckpointDir.isDefined
    if (reliable) {
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = df.checkpoint(eager)
      if (eager) df.unpersist(blocking = false)
      else
        lastLazyPersist.put(System.identityHashCode(ss).toString, df)
          .foreach(_.unpersist(blocking = false))
      out
    } else df.localCheckpoint(eager)
  }
}
