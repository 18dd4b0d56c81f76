package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** DDL surface (SURVEY.md §2.1 infra rows): the reference's
  * create-if-not-exists target table (weather-etl.py:67-78) and
  * drop-and-recreate staging table (weather-etl.py:82-94), on the
  * Spark session catalog.
  *
  * At scale the target would be a partitioned external table
  * (PARTITIONED BY date) so merges prune to touched partitions; the
  * staging "table" is a temp view over the in-flight micro-batch —
  * no physical scratch table needed (SURVEY.md §1.3).
  */
object Ddl {

  /** CREATE TABLE IF NOT EXISTS weather(...) — weather-etl.py:67-78.
    * The composite PK becomes the engine's dedup/upsert invariant
    * (enforced by Upsert, not the catalog).
    */
  def createWeatherTable(spark: SparkSession, location: String): Unit =
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS weather (
         |  time TIMESTAMP,
         |  city_name STRING,
         |  weather_description STRING,
         |  temperature DOUBLE
         |) USING parquet LOCATION '$location'""".stripMargin)

  /** The staging-table analog (weather-etl.py:82-94): the micro-batch
    * registered as a replaceable temp view — dropped and recreated
    * per batch like the reference's DROP TABLE + CREATE, with zero
    * storage churn.
    */
  def stageBatch(batch: DataFrame, name: String = "weather_temp"): Unit =
    batch.createOrReplaceTempView(name)

  def dropStaging(spark: SparkSession, name: String = "weather_temp"): Unit =
    spark.catalog.dropTempView(name)
}
