package graft

import org.apache.spark.sql.functions._

/** Sharp invariants of the monitoring wave — exact confusion-cell /
  * moment recomputes and band-definition checks.
  */
class Round11lSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("mcc: cells partition each source; |mcc| <= 1; one source recomputed") {
    val rows = run("q_x_mcc").collect()
    val perSrc = Tables.table(spark, sfDir, "documents")
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4) ==
        perSrc(r.getString(0)), "cells partition the source")
      if (!r.isNullAt(5)) assert(math.abs(r.getDouble(5)) <= 1.0 + 1e-9)
    }
    val h = rows.find(r => !r.isNullAt(5)).get
    val (tp, fp, fn, tn) =
      (h.getLong(1).toDouble, h.getLong(2).toDouble,
        h.getLong(3).toDouble, h.getLong(4).toDouble)
    val mcc = (tp * tn - fp * fn) /
      math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    assert(math.abs(h.getDouble(5) - mcc) < 1e-6)
  }

  test("bollinger: bands bracket the mid; breach iff outside; window excludes self") {
    val rows = run("q_x_bollinger").collect()
    assert(rows.nonEmpty)
    val daily = Tables.table(spark, sfDir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate) -> r.getLong(2)).toMap
    rows.foreach { r =>
      assert(r.getDouble(4) <= r.getDouble(3) && r.getDouble(3) <= r.getDouble(5),
        "lo <= mid <= hi")
      val outside = r.getLong(2).toDouble < r.getDouble(4) ||
        r.getLong(2).toDouble > r.getDouble(5)
      assert(r.getBoolean(6) == outside, "breach definition")
      // band mid from the PRECEDING 7 days, not including the day itself
      val (t, d) = (r.getString(0), r.getDate(1).toLocalDate)
      val win = (1 to 7).flatMap(k => daily.get((t, d.minusDays(k.toLong))))
      assert(win.size == 7)
      assert(math.abs(r.getDouble(3) - win.sum.toDouble / 7) < 1e-5)
    }
  }

  test("cpk matches an exact cent-moment recompute; cp >= cpk") {
    val rows = run("q_x_cpk").collect()
    val vals = Tables.table(spark, sfDir, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { r =>
      val vs = vals(r.getString(0))
      val n = vs.length.toDouble
      val mean = vs.sum / n
      val sd = math.sqrt(vs.map(v => (v - mean) * (v - mean)).sum / (n - 1))
      assert(math.abs(r.getDouble(2) - mean / 100) < 1e-4)
      assert(math.abs(r.getDouble(4) - 50000.0 / (6 * sd)) < 1e-4)
      assert(r.getDouble(4) >= r.getDouble(5) - 1e-9, "cp >= cpk always")
    }
  }
}
