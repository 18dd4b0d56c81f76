package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed dedup + upsert primitives (SURVEY.md §2.6 U1/U2).
  *
  * Re-expresses the reference's `SELECT DISTINCT` staging dedup
  * (reference dags/weather-etl.py:155-158) and its
  * `INSERT ... ON CONFLICT (pk) DO UPDATE` merge (weather-etl.py:152-163)
  * as Spark compositions. Conflict ordering is explicit (priority /
  * order column), never row-order-dependent, so results are
  * deterministic under any partitioning — the property that lets the
  * same code run identically on local[32] and a 1000-executor cluster.
  */
object Upsert {

  /** U1 keyed form: keep exactly one row per key, the one with the
    * greatest (orderCols) tuple. orderCols must be made unique by the
    * caller (e.g. Seq(ts, event_id)) for determinism.
    */
  def dedupKeyed(df: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** U2: last-writer-wins merge — rows of `incoming` replace same-key
    * rows of `target`; unmatched target rows survive. Both sides must
    * share a schema and be unique per key (dedup first if not).
    *
    * anti-join + union: one shuffle on the key (or none if both sides
    * are already co-partitioned/bucketed by key). Streaming form: call
    * inside foreachBatch with the micro-batch as `incoming`.
    */
  def upsert(target: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    target.join(incoming.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(incoming)

  /** U2 general form: union both sides with an explicit priority and
    * keep the winner per key — equivalent to [[upsert]] but also
    * handles intra-batch duplicates in one pass. `orderCols` break ties
    * within the same priority.
    */
  def upsertByPriority(
      target: DataFrame, incoming: DataFrame,
      keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val tagged = target.withColumn("__prio", lit(0))
      .unionByName(incoming.withColumn("__prio", lit(1)))
    dedupKeyed(tagged, keys, col("__prio") +: orderCols).drop("__prio")
  }
}
