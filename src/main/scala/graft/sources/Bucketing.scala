package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (co-located) tables — the shuffle-elimination strategy for
  * repeated big-big joins at 100 TB (SURVEY.md "Partitioning &
  * shuffle").
  *
  * A fact table bucketed by its join key joins another table bucketed
  * the same way with NO Exchange on either side: Spark's
  * EnsureRequirements sees HashPartitioning(key, n) already satisfied.
  * At cluster scale this converts the dominant per-query cost
  * (shuffling the fact table) into a one-time write-side cost — the
  * classic warehouse layout for `lineitem ⋈ orders`-shaped workloads.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, name: String, key: String,
      nBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(name)

  /** Join two same-bucketed tables on their bucket key. The spec
    * asserts the physical plan contains no Exchange.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
