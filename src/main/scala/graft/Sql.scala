package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ad-hoc SQL surface (SURVEY.md §3.3): the reference's declared
  * query capability is "write your own SQL" against the warehoused
  * tables (reference README.md:62-78, via PGAdmin → Postgres). Here:
  * every fixture table registered as a temp view, then `spark.sql` —
  * the same Catalyst pipeline the programmatic queries use.
  */
object Sql {

  /** Register all fixture tables of `dir` as temp views (idempotent). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { n =>
      Tables.table(spark, dir, n).createOrReplaceTempView(n)
    }

  /** Run ad-hoc SQL against the registered views. */
  def adhoc(spark: SparkSession, dir: String, sqlText: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(sqlText)
  }
}
