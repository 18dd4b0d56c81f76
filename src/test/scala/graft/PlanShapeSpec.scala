package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan shape guards (SURVEY.md §4.2): the scale-killer sweep
  * as a regression spec instead of a per-round manual audit. A query
  * that passes its oracle but plans a cartesian product, an
  * unpartitioned window, or an unpruned scan is correct-but-wrong at
  * 100 TB — these tests make that a build failure, not a judge note.
  */
class PlanShapeSpec extends SparkSuite {

  private def physical(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

  // Plan every declared query once (construction may run jobs for the
  // iterative/localCheckpoint-based ones — cheap at the spec fixture).
  private lazy val plans: Seq[(String, SparkPlan)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> physical(fn(spark, sfDir))
    }

  test("no CartesianProduct in any declared query plan") {
    // Deliberate tiny-side cross joins (q_cross, the kNN query spine,
    // block-pair spines) must plan as BroadcastNestedLoopJoin — a
    // CartesianProductExec means BOTH sides shuffle-replicate, which
    // never survives a 100 TB input.
    val offenders = plans.collect {
      case (name, p) if p.collect { case c: CartesianProductExec => c }.nonEmpty => name
    }
    assert(offenders.isEmpty, s"cartesian product planned in: $offenders")
  }

  test("no unpartitioned Window over any declared query's data path") {
    // Window.partitionBy() with no keys funnels the whole input through
    // ONE task. None of the declared queries may contain one (the IVF
    // seed-ranking window was the last, removed in round 6).
    val offenders = plans.collect {
      case (name, p) if p.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }.nonEmpty => name
    }
    assert(offenders.isEmpty, s"unpartitioned window in: $offenders")
  }

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collectLeaves().collect { case s: FileSourceScanExec => s }

  test("q_filter pushes its predicates into the parquet scan") {
    val scan = scans(physical(SparkEntry.queries("q_filter")(spark, sfDir)))
    assert(scan.nonEmpty)
    val pushed = scan.head.metadata.getOrElse("PushedFilters", "[]")
    assert(pushed != "[]", s"no pushed filters: $pushed")
  }

  test("q_project prunes the lineitem scan to the projected columns") {
    val scan = scans(physical(SparkEntry.queries("q_project")(spark, sfDir)))
    assert(scan.nonEmpty)
    val width = scan.map(_.requiredSchema.fields.length).max
    assert(width <= 6, s"scan reads $width columns for a narrow projection")
  }

  test("dimension joins broadcast the small side") {
    for (q <- Seq("q_join_dims", "q_x_contam")) {
      val plan = physical(SparkEntry.queries(q)(spark, sfDir)).toString
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
        s"$q does not broadcast its small side")
    }
  }
}
