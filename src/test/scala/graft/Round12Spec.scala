package graft

import org.apache.spark.sql.functions._

/** Sharp invariants of the round-12 statistics wave — exact driver
  * recomputes (Durbin–Levinson, the Scholz–Stephens midrank formula,
  * the ECF distance) plus cross-statistic consistency with q_x_acf.
  */
class Round12Spec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def lengthsBySource(): Map[String, Seq[Long]] =
    Tables.table(spark, sfDir, "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  test("pacf lag 1 equals acf lag 1; one event_type matches a driver Durbin-Levinson") {
    val pacf = run("q_x_pacf").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val acf = run("q_x_acf").collect()
      .filter(_.getInt(1) <= 1)
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    acf.foreach { case ((et, k), a) =>
      assert(math.abs(pacf((et, k)) - a) < 1e-9, s"pacf($et, 1) != acf($et, 1)")
    }
    // driver DL recompute for one event_type from the daily series
    val et = pacf.keys.head._1
    val daily = Tables.table(spark, sfDir, "events")
      .filter(col("event_type") === et)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")), 6).as("v"))
      .orderBy(col("day")).collect().map(_.getDouble(1))
    def corrAt(k: Int): Double = {
      val pairs = daily.drop(k).zip(daily.dropRight(k))
      val (xs, ys) = (pairs.map(_._1), pairs.map(_._2))
      val (mx, my) = (xs.sum / xs.length, ys.sum / ys.length)
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val (sx, sy) = (math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum),
        math.sqrt(ys.map(y => (y - my) * (y - my)).sum))
      math.round(cov / (sx * sy) * 1e6) / 1e6
    }
    val (r1, r2, r3) = (corrAt(1), corrAt(2), corrAt(3))
    val p2 = (r2 - r1 * r1) / (1 - r1 * r1)
    val f21 = r1 * (1 - p2)
    val p3 = (r3 - f21 * r2 - p2 * r1) / (1 - f21 * r1 - p2 * r2)
    assert(math.abs(pacf((et, 1)) - r1) < 1e-5, s"dl p1: $r1")
    assert(math.abs(pacf((et, 2)) - p2) < 1e-5, s"dl p2: $p2")
    assert(math.abs(pacf((et, 3)) - p3) < 1e-5, s"dl p3: $p3")
  }

  test("ad: one pair matches a driver Scholz-Stephens midrank recompute") {
    val rows = run("q_x_ad").collect()
    assert(rows.nonEmpty)
    val ls = lengthsBySource()
    val h = rows.head
    val (xs, ys) = (ls(h.getString(0)), ls(h.getString(1)))
    val (na, nb) = (xs.length.toDouble, ys.length.toDouble)
    val n = na + nb
    val zs = (xs ++ ys).distinct.sorted
    var (sa, sb) = (0.0, 0.0)
    zs.foreach { z =>
      val l = (xs.count(_ == z) + ys.count(_ == z)).toDouble
      val ma = xs.count(_ < z) + xs.count(_ == z) / 2.0
      val mb = ys.count(_ < z) + ys.count(_ == z) / 2.0
      val b = (xs ++ ys).count(_ < z) + l / 2.0
      val den = b * (n - b) - n * l / 4.0
      sa += l * math.pow(n * ma - na * b, 2) / den
      sb += l * math.pow(n * mb - nb * b, 2) / den
    }
    val a2 = (n - 1) / (n * n) * (sa / na + sb / nb)
    assert(math.abs(h.getDouble(2) - a2) < 1e-4, s"ad recompute: $a2")
  }

  test("epps: nonnegative; one pair matches a driver ECF recompute") {
    val rows = run("q_x_epps").collect()
    rows.foreach(r => assert(r.getDouble(2) >= -1e-9))
    val ls = lengthsBySource()
    val h = rows.head
    val (xs, ys) = (ls(h.getString(0)), ls(h.getString(1)))
    val n = (xs.length + ys.length).toDouble
    val pooled = (xs ++ ys).sorted
    // declared type-1 discrete quantiles: smallest v with 4*F >= N (3N)
    def q(p: Int): Long = {
      val need = (n * p / 4.0).ceil
      pooled(pooled.indices.find(i => i + 1 >= need).get)
    }
    val s = (q(3) - q(1)) / 2.0
    def ecf(vs: Seq[Long], t: Double): (Double, Double) =
      (vs.map(v => math.cos(t * v)).sum / vs.length,
        vs.map(v => math.sin(t * v)).sum / vs.length)
    val d = Seq(0.4 / s, 0.8 / s).map { t =>
      val (ar, ai) = ecf(xs, t); val (br, bi) = ecf(ys, t)
      math.pow(ar - br, 2) + math.pow(ai - bi, 2)
    }.sum * n
    assert(math.abs(h.getDouble(2) - d) < 1e-4, s"epps recompute: $d")
  }
}
