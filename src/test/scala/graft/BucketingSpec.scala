package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Co-located joins: both sides bucketed by the join key ⇒ zero
  * Exchange in the physical plan — the shuffle-free big-big join
  * layout for 100 TB (SURVEY.md "Partitioning & shuffle").
  */
class BucketingSpec extends SparkSuite {

  test("join of two same-bucketed tables plans no shuffle Exchange") {
    val li = Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.table(spark, sfDir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(ord, "ord_b", "l_orderkey", 8)

    val joined = Bucketing.bucketedJoin(spark, "li_b", "ord_b", "l_orderkey")
    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() === li.join(ord, "l_orderkey").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
