package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter runtime pruning for selective joins — the explicit
  * form of the runtime-filter optimization (Spark's own
  * InjectRuntimeFilter does the same under AQE; here it is a library
  * operator so a pipeline can apply it deliberately).
  *
  * Use case at 100 TB: `fact ⋉ dim` where the dim side is selective
  * (e.g. 0.1% of keys survive a filter). A plain semi join shuffles
  * the ENTIRE fact table on the key; with a bloom filter built from
  * the dim keys and broadcast to the scan, ~99% of fact rows drop
  * BEFORE the exchange, so shuffled bytes ∝ surviving rows. The final
  * exact semi join removes bloom false positives — results are
  * identical to the plain semi join at any fpp.
  *
  * Build cost: `df.stat.bloomFilter` runs a distributed treeAggregate
  * (one pass over dim, O(bits) driver memory — ~1.2 MB per million
  * keys at 1% fpp; size the expectedNumItems honestly at scale).
  */
object BloomPrune {

  /** `fact ⋉ dim` on fact(factKey) == dim(dimKey), bloom-pruned before
    * the shuffle, exact after it.
    */
  def semiJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedNumItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val spark = fact.sparkSession
    val pruned = buildBloom(dim, dimKey, expectedNumItems, fpp) match {
      case Some(bloom) =>
        val bc = spark.sparkContext.broadcast(bloom)
        val mightContain = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
        fact.filter(mightContain(col(factKey).cast("long")))
      case None => fact // empty dim: nothing to prune with (result is empty anyway)
    }
    pruned.join(dim.select(col(dimKey)).distinct(), col(factKey) === col(dimKey), "left_semi")
  }

  /** `stat.bloomFilter` over ZERO rows yields a filter with a null bit
    * array that NPEs on probe — detect it with a driver-side probe.
    */
  private def buildBloom(dim: DataFrame, dimKey: String,
      expectedNumItems: Long, fpp: Double) =
    try {
      val b = dim.stat.bloomFilter(dimKey, expectedNumItems, fpp)
      b.mightContainLong(0L)
      Some(b)
    } catch { case _: NullPointerException => None }

  /** The pruning predicate alone (for composing into a larger plan:
    * e.g. prune a scan feeding an aggregation rather than a join).
    */
  def pruneCol(dim: DataFrame, dimKey: String, factKey: Column,
      expectedNumItems: Long = 1000000L, fpp: Double = 0.01): Column =
    buildBloom(dim, dimKey, expectedNumItems, fpp) match {
      case Some(bloom) =>
        val bc = dim.sparkSession.sparkContext.broadcast(bloom)
        val mightContain = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
        mightContain(factKey.cast("long"))
      case None => lit(false) // empty dim: no key can match
    }
}
