package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ad-hoc SQL surface (SURVEY.md §3.3): the reference's declared
  * query capability is "write your own SQL" against the warehoused
  * tables (reference README.md:62-78, via PGAdmin → Postgres). Here:
  * every fixture table registered as a temp view, then `spark.sql` —
  * the same Catalyst pipeline the programmatic queries use.
  */
object Sql {

  // weak keys: long-lived drivers creating many sessions must not be
  // pinned by this cache
  private val registeredDir =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Register all fixture tables of `dir` as temp views. Skipped when
    * this session already has `dir`'s views (ad-hoc queries re-enter
    * here per statement; 10 view re-registrations per statement showed
    * up in the bench profile). Assumes nothing else reuses the fixture
    * table names as temp views in the same session.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    if (registeredDir.get(spark) != dir) {
      Tables.names.foreach { n =>
        Tables.table(spark, dir, n).createOrReplaceTempView(n)
      }
      registeredDir.put(spark, dir)
    }

  /** Run ad-hoc SQL against the registered views. */
  def adhoc(spark: SparkSession, dir: String, sqlText: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(sqlText)
  }
}
