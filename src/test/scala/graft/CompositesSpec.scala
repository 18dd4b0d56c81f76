package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** The TPC-H composite showcase queries: result sanity + the plan
  * shapes that make them scale (top-k as TakeOrderedAndProject, dims
  * broadcast — SURVEY §4.2).
  */
class CompositesSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def physical(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

  test("q_tpch_q1: one-stage wide aggregate, sums consistent with averages") {
    val rows = run("q_tpch_q1").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sumQty, avgQty, n) = (r.getDouble(2), r.getDouble(6), r.getLong(9))
      assert(math.abs(avgQty - sumQty / n) < 1e-6, "avg_qty != sum_qty / count")
      assert(r.getDouble(4) <= r.getDouble(3) + 1e-9,
        "disc price cannot exceed base price")
      assert(r.getDouble(5) >= r.getDouble(4) - 1e-9,
        "charge (with tax) cannot be below disc price")
    }
    // no join, no window: scan -> partial agg -> exchange -> final agg
    // -> (range exchange for the tiny ordered output) — exactly two
    // exchanges, of which only the hash one moves fact-sized data
    val plan = physical(run("q_tpch_q1"))
    assert(plan.collect { case s: ShuffleExchangeExec => s }.size <= 2,
      "Q1 must be agg-exchange + output-order exchange only")
  }

  test("q_tpch_q3: top-k plans as TakeOrderedAndProject, revenue ordered desc") {
    val df = run("q_tpch_q3")
    assert(physical(df).collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      "limit-after-order must plan as TakeOrderedAndProject, not a global sort")
    val rev = df.collect().map(_.getDouble(1))
    assert(rev.length <= 10)
    rev.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => }
  }

  test("q_tpch_q5: dims join via broadcast, revenue non-negative") {
    val df = run("q_tpch_q5")
    val bhj = physical(df).collect { case b: BroadcastHashJoinExec => b }
    assert(bhj.size >= 2, s"nation/region must broadcast (found ${bhj.size} BHJ)")
    df.collect().foreach(r => assert(r.getDouble(1) >= 0))
  }

  test("q_tpch_q10: top-20 cut is deterministic and revenue matches a driver recompute") {
    val rows = run("q_tpch_q10").collect()
    assert(rows.length <= 20)
    // independent recompute of the winner's revenue
    val top = rows.head
    val expect = Tables.table(spark, sfDir, "orders")
      .filter(org.apache.spark.sql.functions.col("o_custkey") === top.getLong(0))
      .filter(org.apache.spark.sql.functions.expr(
        "o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'"))
      .join(Tables.table(spark, sfDir, "lineitem")
        .filter(org.apache.spark.sql.functions.col("l_returnflag") === "R"),
        org.apache.spark.sql.functions.expr("o_orderkey = l_orderkey"))
      .selectExpr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS r")
      .collect().map(_.getDecimal(0)).foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    assert(math.abs(top.getDouble(2) - expect.doubleValue()) < 1e-6,
      s"revenue ${top.getDouble(2)} != recomputed ${expect.doubleValue()}")
  }
}
