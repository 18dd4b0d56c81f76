package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental maintenance of an algebraic rollup — the pattern behind
  * the reference's 5-minute micro-batches (stage → merge, cost bounded
  * by the batch): keep per-key partial-aggregate STATE (count / exact
  * DECIMAL sum / min / max), fold each delta batch in by re-aggregating
  * state ∪ delta-partial, and derive read-time stats (avg) from state.
  *
  * Why it scales: the merge shuffles only rollup-sized frames — the
  * maintained state (|distinct keys|) and the delta's partial
  * (≤ |batch|) — never the raw history. With the state table bucketed
  * by key, even that shuffle disappears (sources/Bucketing). Sums use
  * DECIMAL(18,6), so folding is EXACTLY associative: any split of the
  * input into batches produces bit-identical state to a full
  * recompute — no drift after months of 5-minute merges
  * (IncrementalAggSpec asserts equality across split rules, including
  * empty and key-disjoint deltas).
  */
object IncrementalAgg {

  private val dec6 = DecimalType(18, 6)

  /** Aggregate raw rows into rollup state: (keys..., n, sum_v, min_v,
    * max_v). Also the delta-batch partial — same shape, so `merge`
    * composes. */
  def rollup(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(dec6)).cast(dec6).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Fold a delta partial into maintained state. Associative and
    * commutative — batches can arrive in any order, and a key present
    * in only one side passes through unchanged. */
  def merge(state: DataFrame, deltaPartial: DataFrame,
      keys: Seq[String]): DataFrame =
    state.unionByName(deltaPartial)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_v")).cast(dec6).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Read-time projection of derived stats from state. */
  def withAvg(state: DataFrame): DataFrame =
    state.withColumn("avg_v",
      round(col("sum_v").cast("double") / col("n"), 6))
}
