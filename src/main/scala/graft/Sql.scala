package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ad-hoc SQL surface (SURVEY.md §3.3): the reference's declared
  * query capability is "write your own SQL" against the warehoused
  * tables (reference README.md:62-78, via PGAdmin → Postgres). Here:
  * every fixture table registered as a temp view, then `spark.sql` —
  * the same Catalyst pipeline the programmatic queries use.
  */
object Sql {

  private val registeredDir =
    scala.collection.concurrent.TrieMap.empty[SparkSession, String]

  /** Register all fixture tables of `dir` as temp views. Skipped when
    * this session already has `dir`'s views (ad-hoc queries re-enter
    * here per statement; 10 view re-registrations per statement showed
    * up in the bench profile).
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    if (!registeredDir.get(spark).contains(dir)) {
      Tables.names.foreach { n =>
        Tables.table(spark, dir, n).createOrReplaceTempView(n)
      }
      registeredDir(spark) = dir
    }

  /** Run ad-hoc SQL against the registered views. */
  def adhoc(spark: SparkSession, dir: String, sqlText: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(sqlText)
  }
}
