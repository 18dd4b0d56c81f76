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

  // ---- decorrelation composites (r10 verdict item 3): the subquery
  // forms must reach the physical plan as HASH joins — Catalyst's
  // RewritePredicateSubquery / scalar-subquery decorrelation — never
  // a per-row re-execution or a nested-loop join on a fact table.

  private def joinNodes(plan: SparkPlan): Seq[String] =
    plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
        s"${j.getClass.getSimpleName}:${j.joinType}"
    }

  private def assertNoFactBnlj(plan: SparkPlan): Unit = {
    // A BNLJ/cartesian is tolerable only when BOTH sides are dim-sized
    // (region/nation); none of these plans should need one at all.
    val bad = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(bad.isEmpty, s"nested-loop/cartesian in plan: ${bad.map(_.nodeName)}")
  }

  test("q_tpch_q18: HAVING-IN subquery decorrelates to a left-semi hash join") {
    val df = run("q_tpch_q18")
    val joins = joinNodes(physical(df))
    assert(joins.exists(j => j.contains("LeftSemi")),
      s"IN (SELECT ... HAVING) must plan as a left-semi join, got $joins")
    assertNoFactBnlj(physical(df))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every surviving order really does exceed the quantity threshold
    rows.foreach(r => assert(r.getDouble(5) > 300, s"sum_qty <= 300 in $r"))
    // ordered desc by o_totalprice
    rows.map(_.getDouble(4)).sliding(2)
      .foreach { case Array(a, b) => assert(a >= b); case _ => }
  }

  test("q_tpch_q21: EXISTS/NOT EXISTS chain plans as semi + anti hash joins") {
    val df = run("q_tpch_q21")
    val joins = joinNodes(physical(df))
    assert(joins.exists(_.contains("LeftSemi")),
      s"EXISTS must plan as left-semi, got $joins")
    assert(joins.exists(_.contains("LeftAnti")),
      s"NOT EXISTS must plan as left-anti, got $joins")
    assertNoFactBnlj(physical(df))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) > 0))
    // the anti-join semantics: a flagged supplier must be the ONLY
    // late supplier on each counted order — cross-check one supplier
    // against an independent recompute
    val sName = rows.head.getString(0)
    import org.apache.spark.sql.functions.{col, expr}
    // grain matters: numwait counts late LINE ITEMS (l1 rows), not
    // distinct orders — keep duplicates per (order, supplier)
    val lateLines = Tables.table(spark, sfDir, "lineitem")
      .join(Tables.table(spark, sfDir, "orders").filter(col("o_orderstatus") === "F"),
        expr("l_orderkey = o_orderkey"))
      .filter(expr("l_shipdate > o_orderdate + INTERVAL 60 DAY"))
      .select(col("l_orderkey"), col("l_suppkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val lateByOrder = lateLines.groupBy(_._1)
    val multi = Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey")).distinct.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val sKey = Tables.table(spark, sfDir, "supplier")
      .filter(col("s_name") === sName).collect().head.getLong(0)
    val expect = lateByOrder.collect { case (ok, lines)
      if lines.map(_._2).toSet == Set(sKey) && multi(ok).size > 1 =>
        lines.length
    }.sum
    assert(rows.head.getLong(2) == expect,
      s"numwait ${rows.head.getLong(2)} != independent recompute $expect for $sName")
  }

  // ---- round-11 TPC-H breadth wave: every new composite must avoid
  // fact-table nested loops, and the subquery forms must decorrelate
  // to the right hash-join types.

  test("tpch wave 2: no nested-loop/cartesian joins in any plan") {
    for (q <- Seq("q_tpch_q4", "q_tpch_q6", "q_tpch_q7", "q_tpch_q8",
      "q_tpch_q12", "q_tpch_q13", "q_tpch_q14", "q_tpch_q15",
      "q_tpch_q17", "q_tpch_q19", "q_tpch_q22")) {
      assertNoFactBnlj(physical(run(q)))
    }
  }

  test("q_tpch_q4: EXISTS plans as a left-semi join; counts partition the window") {
    val df = run("q_tpch_q4")
    assert(joinNodes(physical(df)).exists(_.contains("LeftSemi")),
      s"EXISTS must plan as left-semi, got ${joinNodes(physical(df))}")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) > 0))
  }

  test("q_tpch_q22: NOT EXISTS plans as a left-anti join; threshold respected") {
    val df = run("q_tpch_q22")
    assert(joinNodes(physical(df)).exists(_.contains("LeftAnti")),
      s"NOT EXISTS must plan as left-anti, got ${joinNodes(physical(df))}")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every reported group's average balance exceeds the global
    // positive-balance average (each member's balance does)
    import org.apache.spark.sql.functions.col
    val cust = Tables.table(spark, sfDir, "customer")
      .filter(col("c_nationkey") <= 12)
    val thr = cust.filter(col("c_acctbal") > 0.0)
      .selectExpr("CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)")
      .collect().head.getDouble(0)
    rows.foreach { r =>
      assert(r.getDouble(2) / r.getLong(1) > thr,
        s"group mean below the global threshold $thr: $r")
    }
  }

  test("q_tpch_q17: correlated avg decorrelates; revenue matches a driver recompute") {
    val df = run("q_tpch_q17")
    val plan = physical(df)
    assert(plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }.nonEmpty, "per-part avg subquery must become a real aggregate")
    import org.apache.spark.sql.functions.col
    val parts = Tables.table(spark, sfDir, "part")
      .filter(col("p_brand") === "Brand#23" && col("p_size") < 25)
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val lines = Tables.table(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val avgQty = lines.groupBy(_._1).view
      .mapValues(ls => ls.map(_._2).sum / ls.length).toMap
    val expect = lines.collect {
      case (pk, q, p) if parts(pk) && q < 0.3 * avgQty(pk) => BigDecimal(p).setScale(2)
    }.sum.toDouble / 7.0
    val got = df.collect().head.getDouble(0)
    assert(math.abs(got - expect) < 1e-4, s"avg_yearly $got != driver $expect")
  }

  test("q_tpch_q8: market share is a valid fraction per year") {
    val rows = run("q_tpch_q8").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(1) >= 0 && r.getDouble(1) <= 1))
  }

  test("q_tpch_q13: custdist conserves the customer universe, zero bucket present") {
    val rows = run("q_tpch_q13").collect()
    val n = Tables.table(spark, sfDir, "customer").count()
    assert(rows.map(_.getLong(1)).sum == n,
      "order-count distribution must partition all customers")
    // the priority exclusion rides inside the LEFT join, so customers
    // with only URGENT orders land in c_count = 0 instead of vanishing
    assert(rows.map(_.getLong(0)).min == 0 || rows.map(_.getLong(1)).sum == n)
  }

  test("q_tpch_q2: correlated scalar-min decorrelates to aggregate + equi join") {
    val df = run("q_tpch_q2")
    val plan = physical(df)
    assertNoFactBnlj(plan)
    // the rewritten subquery joins the per-part min back on p_partkey:
    // at least one hash agg and one equi join must appear
    assert(plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }.nonEmpty, "scalar-min subquery must become a real aggregate")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // each reported (part, supplier) really is at the part's min unit
    // price within EUROPE — independent recompute for the top row
    val pk = rows.head.getLong(3)
    import org.apache.spark.sql.functions.col
    val euroSupp = Tables.table(spark, sfDir, "supplier")
      .join(Tables.table(spark, sfDir, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.table(spark, sfDir, "region").filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val prices = Tables.table(spark, sfDir, "lineitem")
      .filter(col("l_partkey") === pk)
      .select(col("l_suppkey"), (col("l_extendedprice") / col("l_quantity")).as("u"))
      .collect().filter(r => euroSupp(r.getLong(0))).map(_.getDouble(1))
    assert(prices.nonEmpty)
    val sMin = prices.min
    val reported = Tables.table(spark, sfDir, "lineitem")
      .filter(col("l_partkey") === pk)
      .select(col("l_suppkey"), (col("l_extendedprice") / col("l_quantity")).as("u"))
      .collect()
      .filter(r => euroSupp(r.getLong(0)) && r.getDouble(1) == sMin)
      .map(_.getLong(0)).toSet
    val sName2 = rows.filter(_.getLong(3) == pk).map(_.getString(1)).toSet
    val minNames = Tables.table(spark, sfDir, "supplier")
      .filter(col("s_suppkey").isin(reported.toSeq: _*))
      .collect().map(_.getString(1)).toSet
    assert(sName2.subsetOf(minNames),
      s"reported suppliers $sName2 not all at the min price ($minNames)")
  }

  // ---- round-11 TPC-H completion wave (Q9/Q11/Q16/Q20): the four
  // partsupp-dependent queries on their lineitem re-anchoring.

  test("tpch wave 3: no nested-loop/cartesian joins in any plan") {
    for (q <- Seq("q_tpch_q9", "q_tpch_q11", "q_tpch_q16", "q_tpch_q20"))
      assertNoFactBnlj(physical(run(q)))
  }

  test("q_tpch_q9: star join broadcasts the dims; profit <= revenue per cell") {
    val df = run("q_tpch_q9")
    assert(physical(df).collect { case b: BroadcastHashJoinExec => b }.size >= 2,
      "part/supplier/nation dims must broadcast in the Q9 star")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // profit against cost floored at the corpus-min unit price can
    // never exceed plain discounted revenue for the same cell
    import org.apache.spark.sql.functions.{col, expr}
    val rev = Tables.table(spark, sfDir, "lineitem")
      .join(Tables.table(spark, sfDir, "part")
        .filter(col("p_name").like("%red%")), expr("p_partkey = l_partkey"))
      .join(Tables.table(spark, sfDir, "orders"), expr("o_orderkey = l_orderkey"))
      .join(Tables.table(spark, sfDir, "supplier"), expr("s_suppkey = l_suppkey"))
      .join(Tables.table(spark, sfDir, "nation"), expr("s_nationkey = n_nationkey"))
      .groupBy(col("n_name"), expr("CAST(year(o_orderdate) AS BIGINT)").as("y"))
      .agg(expr("CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE)").as("rev"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rows.foreach { r =>
      val cell = (r.getString(0), r.getLong(1))
      assert(r.getDouble(2) <= rev(cell) + 1e-6,
        s"profit ${r.getDouble(2)} above revenue ${rev(cell)} for $cell")
    }
  }

  test("q_tpch_q11: scalar threshold respected; values ordered desc") {
    val rows = run("q_tpch_q11").collect()
    assert(rows.nonEmpty)
    val values = rows.map(_.getDouble(1))
    values.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => }
    val total = {
      import org.apache.spark.sql.functions.{col, expr}
      Tables.table(spark, sfDir, "lineitem")
        .join(Tables.table(spark, sfDir, "supplier"), expr("l_suppkey = s_suppkey"))
        .join(Tables.table(spark, sfDir, "nation")
          .filter(col("n_name") === "NATION_3"), expr("s_nationkey = n_nationkey"))
        .selectExpr("CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE)")
        .collect().head.getDouble(0)
    }
    values.foreach(v => assert(v > total * 0.001, s"$v below threshold ${total * 0.001}"))
    // the kept groups cannot sum past the total
    assert(values.sum <= total + 1e-6)
  }

  test("q_tpch_q16: NOT IN plans as a left-anti join; counts match a driver recompute") {
    val df = run("q_tpch_q16")
    assert(joinNodes(physical(df)).exists(_.contains("LeftAnti")),
      s"NOT IN must plan as left-anti, got ${joinNodes(physical(df))}")
    val rows = df.collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions.col
    val flagged = Tables.table(spark, sfDir, "supplier")
      .filter(col("s_acctbal") < 0).collect().map(_.getLong(0)).toSet
    val sizes = Set(1, 4, 7, 10, 14, 19, 23, 36)
    val parts = Tables.table(spark, sfDir, "part")
      .filter(col("p_brand") =!= "Brand#12" && col("p_type") =!= "PROMO")
      .collect().filter(r => sizes(r.getInt(4)))
      .map(r => r.getLong(0) -> (r.getString(2), r.getString(3), r.getInt(4))).toMap
    val expect = Tables.table(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .collect { case (pk, sk) if parts.contains(pk) && !flagged(sk) => (parts(pk), sk) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length).toMap
    rows.foreach { r =>
      val cell = (r.getString(0), r.getString(1), r.getInt(2))
      assert(r.getLong(3) == expect(cell), s"supplier_cnt mismatch for $cell")
    }
    assert(rows.length == expect.size)
  }

  test("q_tpch_q20: nested IN chain plans as semi joins; members dominate a red part") {
    val df = run("q_tpch_q20")
    val joins = joinNodes(physical(df))
    assert(joins.exists(_.contains("LeftSemi")),
      s"IN chain must plan as left-semi, got $joins")
    assertNoFactBnlj(physical(df))
    val rows = df.collect()
    assert(rows.nonEmpty, "Q20 must be non-degenerate at the gate SF")
    import org.apache.spark.sql.functions.{col, expr}
    val redParts = Tables.table(spark, sfDir, "part")
      .filter(col("p_name").like("red%")).collect().map(_.getLong(0)).toSet
    val win = Tables.table(spark, sfDir, "lineitem")
      .filter(expr("l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(t => redParts(t._1))
    val byPart = win.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val dominant = win.groupBy(t => (t._1, t._2)).collect {
      case ((pk, sk), ls) if ls.map(_._3).sum > 0.2 * byPart(pk) => sk
    }.toSet
    val names = Tables.table(spark, sfDir, "supplier")
      .join(Tables.table(spark, sfDir, "nation").filter(col("n_nationkey") < 13),
        expr("s_nationkey = n_nationkey"))
      .collect().filter(r => dominant(r.getLong(0))).map(_.getString(1)).toSet
    assert(rows.map(_.getString(0)).toSet == names,
      s"Q20 membership ${rows.map(_.getString(0)).toSet} != driver $names")
  }
}
