package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (Deequ/Great-Expectations
  * style), compiled into ONE aggregation pass (SURVEY.md §2.8 — the
  * validation gate a training-data pipeline runs before a corpus
  * snapshot is allowed to feed a training run).
  *
  * Every check contributes one aggregate expression to a single
  * `df.agg(...)`; the report explodes the 1-row aggregate into one
  * row per check. 100 TB shape: exactly one scan of the corpus, all
  * metrics computed in the same partial-aggregate pass (map-side
  * combine, one 1-row exchange), then a constant-size explode —
  * adding a check costs one more column in the same pass, never
  * another scan.
  */
object Expectations {

  /** One constraint: `metric` must satisfy `op threshold`, where op is
    * one of ">=", "<=", "==". `metric` must be an AGGREGATE expression
    * over the checked frame (it is evaluated inside one `agg` call).
    */
  final case class Check(name: String, metric: Column, op: String, threshold: Double) {
    require(Set(">=", "<=", "==").contains(op), s"unsupported op '$op'")
  }

  /** Common constraint builders. */
  def neverNull(c: String): Check =
    Check(s"${c}_never_null", sum(when(col(c).isNull, 1).otherwise(0)).cast("double"), "==", 0.0)

  def unique(c: String): Check =
    Check(s"${c}_unique", (count(lit(1)) - countDistinct(col(c))).cast("double"), "==", 0.0)

  def minAtLeast(c: String, bound: Double): Check =
    Check(s"${c}_min", min(col(c)).cast("double"), ">=", bound)

  def maxAtMost(c: String, bound: Double): Check =
    Check(s"${c}_max", max(col(c)).cast("double"), "<=", bound)

  def inSet(c: String, allowed: Seq[String]): Check =
    Check(s"${c}_in_set",
      sum(when(col(c).isInCollection(allowed), 0).otherwise(1)).cast("double"), "==", 0.0)

  def distinctAtMost(c: String, bound: Double): Check =
    Check(s"${c}_cardinality", countDistinct(col(c)).cast("double"), "<=", bound)

  /** Fraction of rows satisfying `cond` (for ratio constraints). */
  def fractionWhere(name: String, cond: Column, op: String, threshold: Double): Check =
    Check(name, avg(when(cond, 1.0).otherwise(0.0)), op, threshold)

  /** Evaluate all checks in one aggregation pass.
    * @return one row per check: (check_name, metric, op, threshold,
    *         passed), ordered by check_name. `metric` is rounded to
    *         6dp for cross-engine display; `passed` compares the
    *         UNROUNDED value.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    val aggs = checks.zipWithIndex.map { case (c, i) => c.metric.cast("double").as(s"m$i") } :+
      count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.drop(1): _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      val m = col(s"m$i")
      val cmp = c.op match {
        case ">=" => m >= c.threshold
        case "<=" => m <= c.threshold
        case "==" => m === c.threshold
      }
      // EMPTY frame ⇒ constraints hold vacuously (Deequ's convention):
      // passed=true, metric stays NULL for display. On a NON-empty
      // frame a NULL metric (e.g. min over an all-NULL column) keeps
      // the honest SQL three-valued verdict — NULL, "unknown", never
      // silently true — matching what the same comparison yields in
      // any SQL engine.
      struct(lit(c.name).as("check_name"), round(m, 6).as("metric"),
        lit(c.op).as("op"), lit(c.threshold).as("threshold"),
        when(col("__n") === 0, lit(true)).otherwise(cmp).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check_name"), col("r.metric"), col("r.op"),
        col("r.threshold"), col("r.passed"))
      .orderBy(col("check_name"))
  }
}
