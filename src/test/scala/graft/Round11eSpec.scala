package graft

import org.apache.spark.sql.functions._

/** Sharp invariants of the round-11 association/cohesion wave —
  * exact driver recomputes for the closed-form statistics, definition
  * bounds for the graph/series outputs.
  */
class Round11eSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("fixture contract: event values are 2dp-exact (cent grain)") {
    val bad = Tables.table(spark, sfDir, "events")
      .filter(abs(col("value") * 100 - round(col("value") * 100)) > 1e-9)
      .count()
    assert(bad == 0L, "ICC's exact cent moments require 2dp values")
  }

  test("ccf: lag 0 matches a driver Pearson recompute; |ccf| <= 1") {
    val rows = run("q_x_ccf").collect()
    assert(rows.length == 7)
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    val hrs = Tables.table(spark, sfDir, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
      .groupBy(col("event_type"), col("hr")).count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val pts = hrs.keys.toSeq.collect {
      case ("click", h) if hrs.contains(("view", h)) =>
        (hrs(("click", h)).toDouble, hrs(("view", h)).toDouble)
    }.toSeq
    val n = pts.length
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val r0 = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(rows.head.getLong(0) == 0L)
    assert(math.abs(rows.head.getDouble(2) - r0) < 1e-5, s"lag-0 recompute: $r0")
  }

  test("odds_ratio: cells partition the corpus; CI brackets the estimate") {
    val rows = run("q_x_odds_ratio").collect()
    val nn = Tables.table(spark, sfDir, "documents").count()
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4) == nn)
      assert(r.getDouble(6) <= r.getDouble(5) && r.getDouble(5) <= r.getDouble(7),
        "ci_lo <= or <= ci_hi")
    }
  }

  test("cmh matches an exact driver recompute") {
    val row = run("q_x_cmh").collect().head
    val cells = Tables.table(spark, sfDir, "documents")
      .groupBy(col("source"))
      .agg(sum(when(col("n_chars") > 200 && col("lang") === "en", 1L)
          .otherwise(0L)).as("a"),
        sum(when(col("n_chars") > 200, 1L).otherwise(0L)).as("r1"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c1"),
        count(lit(1)).as("nk"))
      .collect().filter(_.getLong(4) > 1)
      .sortBy(_.getString(0))
    var dev = 0.0
    var v = 0.0
    cells.foreach { c =>
      val (a, r1, c1, nk) =
        (c.getLong(1), c.getLong(2), c.getLong(3), c.getLong(4))
      dev += a.toDouble - r1.toDouble * c1 / nk
      v += r1.toDouble * (nk - r1) * c1 * (nk - c1) /
        (nk.toDouble * nk * (nk - 1))
    }
    assert(row.getLong(0) == cells.length.toLong)
    assert(math.abs(row.getDouble(2) - dev * dev / v) < 1e-4,
      s"cmh recompute: ${dev * dev / v}")
  }

  test("icc matches an exact driver recompute; -1 < icc <= 1") {
    val row = run("q_x_icc").collect().head
    val cells = Tables.table(spark, sfDir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("v"))
      .collect().map(r => ((r.getString(0), r.getDate(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = cells.size
    val n = cells.values.map(_.length).sum
    val t = cells.values.flatten.sum
    val q = cells.values.flatten.map(x => x.toDouble * x).sum
    val btw = cells.values.map(vs => vs.sum.toDouble * vs.sum / vs.length).sum
    val msb = (btw - t.toDouble * t / n) / (k - 1)
    val msw = (q - btw) / (n - k)
    assert(row.getLong(0) == k.toLong && row.getLong(1) == n.toLong)
    assert(math.abs(row.getDouble(3) - msb / msw) < 1e-5, s"f recompute: ${msb / msw}")
    assert(row.getDouble(2) > -1.0 && row.getDouble(2) <= 1.0)
  }

  test("modularity: mass conservation and Q in [-0.5, 1]") {
    val rows = run("q_x_modularity").collect()
    val m = rows.head.getLong(3)
    assert(rows.map(_.getLong(2)).sum == 2 * m, "degree sum = 2m")
    assert(rows.map(_.getLong(1)).sum <= m, "within-label edges <= m")
    val q = rows.head.getDouble(4)
    assert(q >= -0.5 - 1e-9 && q <= 1.0 + 1e-9)
    // driver recompute of Q from the per-label masses
    val qr = rows.map(r =>
      r.getLong(1).toDouble / m -
        math.pow(r.getLong(2).toDouble / (2.0 * m), 2)).sum
    assert(math.abs(q - qr) < 1e-5, s"Q recompute: $qr")
  }
}
