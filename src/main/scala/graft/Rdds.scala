package graft

import org.apache.spark.rdd.RDD

/** Block-manager hygiene helpers shared by Bench and the streaming
  * sinks.
  */
object Rdds {
  // RDD.isLocallyCheckpointed is public bytecode but private[spark] in
  // the Scala signature; reflection reads it without infiltrating the
  // org.apache.spark package. It is true from the moment
  // localCheckpoint() is CALLED (unlike isCheckpointed, which flips
  // only on full materialization and so misses the partially-computed
  // blocks of an execution that threw mid-action).
  private val isLocalCp = classOf[RDD[_]].getMethod("isLocallyCheckpointed")

  def isLocallyCheckpointed(r: RDD[_]): Boolean =
    isLocalCp.invoke(r).asInstanceOf[Boolean]
}
