package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Upsert
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY.md §2: one entry per
  * operator, each paired (where SQL-expressible) with DuckDB oracle SQL
  * in `oracleSql`. Column names and row order match between the two by
  * construction (total ORDER BY, explicit aliases, DECIMAL money sums —
  * SURVEY.md §7.4).
  */
object SparkEntry {

  /** Flagship slice (SURVEY.md §7.1): ingest `events` (the API-feed
    * analog of weather-etl.py:98-143) → typed projection → U1 dedup
    * (weather-etl.py:155-158) → U2 last-writer-wins snapshot per
    * (user, 5-min window) (weather-etl.py:152-163) → tumbling aggregate
    * → ordered output. Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    entry(spark, "/root/testdata/sf0.001")

  /** Fixture-parameterized flagship (r10 verdict item 8): same plan at
    * any SF dir; the no-arg overload keeps the driver's smoke-call
    * contract on sf0.001.
    */
  def entry(spark: SparkSession, dir: String): DataFrame = {
    val typed = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      // structured payload metrics (weather-etl.py:123 analog):
      // surfaced via QueryExecutionListener / observedMetrics.
      .observe("graft_ingest", count(lit(1)).as("rows_in"),
        sum(col("value")).as("value_sum"))
    val deduped = typed.dropDuplicates("event_id")
    val keyed = deduped.withColumn("ws", window(col("ts"), "5 minutes").getField("start"))
    val snapshot = Upsert.dedupKeyed(keyed, Seq("user_id", "ws"), Seq(col("ts"), col("event_id")))
    snapshot
      .groupBy(col("ws"))
      .agg(count(lit(1)).as("n_users"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("ws"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Scalars.defs ++ Joins.defs ++ Aggregates.defs ++ Windows.defs ++
      SetOps.defs ++ StreamingBatch.defs ++ Extensions.defs ++ Stats.defs ++
      Round10.defs ++ Round10b.defs ++ Composites.defs ++ Round11.defs ++ Round11b.defs ++ Round11c.defs ++ Round11d.defs ++ Round11e.defs ++ Round11f.defs ++ Round11g.defs ++ Round11h.defs ++ Round11i.defs ++ Round11j.defs ++ Round11k.defs ++ Round11l.defs ++ Round11m.defs ++ Round12.defs ++ Round13.defs ++ Round14.defs ++ Round14b.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approx sketches, LSH) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    Scalars.oracle ++ Joins.oracle ++ Aggregates.oracle ++ Windows.oracle ++
      SetOps.oracle ++ StreamingBatch.oracle ++ Extensions.oracle ++ Stats.oracle ++
      Round10.oracle ++ Round10b.oracle ++ Composites.oracle ++ Round11.oracle ++ Round11b.oracle ++ Round11c.oracle ++ Round11d.oracle ++ Round11e.oracle ++ Round11f.oracle ++ Round11g.oracle ++ Round11h.oracle ++ Round11i.oracle ++ Round11j.oracle ++ Round11k.oracle ++ Round11l.oracle ++ Round11m.oracle ++ Round12.oracle ++ Round13.oracle ++ Round14.oracle ++ Round14b.oracle
}
