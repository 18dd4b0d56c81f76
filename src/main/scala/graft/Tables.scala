package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture table loaders (TESTDATA.md / FIXTURES.md).
  *
  * All queries read Parquet through these helpers so that scan-level
  * concerns (the `events` nanosecond-timestamp workaround, column
  * pruning, pushdown) are handled once. At 100 TB these reads become
  * partitioned-directory scans; nothing here assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS), which the
    * Spark Parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos
    * as a plain long and truncate to microseconds — the same truncation
    * DuckDB applies when it coerces TIMESTAMP_NS to its µs TIMESTAMP,
    * so oracle comparisons stay exact.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
