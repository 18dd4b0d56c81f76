package graft

import org.apache.spark.sql.functions._

/** Invariants of the §2.8c statistical operators (queries/Stats.scala)
  * beyond the DuckDB oracle hash: each test pins the STATISTIC's
  * mathematical contract against an independent driver-side reference
  * on the sf0.001 fixture, so a future refactor that keeps the oracle
  * in lockstep but breaks the math (both engines wrong the same way)
  * still fails here.
  */
class StatsSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q_x_mann_whitney: U within [0, n1*n2] and U matches a brute-force rank-sum") {
    val rows = run("q_x_mann_whitney").collect()
    assert(rows.nonEmpty)
    val data = Tables.table(spark, sfDir, "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val (src, n1, n2, u) = (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(u >= 0 && u <= n1.toDouble * n2, s"$src: U=$u outside [0, ${n1 * n2}]")
      // brute force: U = #(x_i > y_j) + 0.5 * #(x_i == y_j)
      val xs = data.filter(_._1 == src).map(_._2)
      val ys = data.filter(_._1 != src).map(_._2)
      assert(xs.length.toLong == n1 && ys.length.toLong == n2)
      var gt = 0L; var eq = 0L
      // value-grain counting (same O(V^2) as the oracle identity)
      val xg = xs.groupBy(identity).map { case (v, a) => (v, a.length.toLong) }
      val yg = ys.groupBy(identity).map { case (v, a) => (v, a.length.toLong) }
      for ((xv, xc) <- xg; (yv, yc) <- yg) {
        if (xv > yv) gt += xc * yc else if (xv == yv) eq += xc * yc
      }
      val uRef = gt + 0.5 * eq
      assert(math.abs(u - uRef) < 1e-6, s"$src: U=$u brute=$uRef")
    }
  }

  test("q_x_anova: F and eta_sq match a brute-force decomposition; F >= 0, eta in [0,1]") {
    val r = run("q_x_anova").head()
    val (k, n, f, eta) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    assert(f >= 0 && eta >= 0 && eta <= 1)
    val data = Tables.table(spark, sfDir, "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r2 => (r2.getString(0), r2.getLong(1).toDouble))
    val groups = data.groupBy(_._1).values.map(_.map(_._2)).toSeq
    assert(groups.size.toLong == k && data.length.toLong == n)
    val grand = data.map(_._2).sum / n
    val ssb = groups.map(g => g.length * math.pow(g.sum / g.length - grand, 2)).sum
    val ssw = groups.map(g => { val m = g.sum / g.length; g.map(x => math.pow(x - m, 2)).sum }).sum
    val fRef = (ssb / (k - 1)) / (ssw / (n - k))
    val etaRef = ssb / (ssb + ssw)
    assert(math.abs(f - fRef) < 1e-4, s"F=$f brute=$fRef")
    assert(math.abs(eta - etaRef) < 1e-6, s"eta=$eta brute=$etaRef")
  }

  test("q_x_spearman: rho in [-1,1] and equals Pearson correlation of average ranks") {
    val rows = run("q_x_spearman").collect()
    assert(rows.nonEmpty)
    val data = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"), hour(col("ts"))).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2).toDouble))
    def avgRanks(v: Seq[Double]): Map[Double, Double] = {
      val sorted = v.sorted.zipWithIndex.map { case (x, i) => (x, (i + 1).toDouble) }
      sorted.groupBy(_._1).map { case (x, rs) => x -> rs.map(_._2).sum / rs.size }
    }
    def pearson(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.length; val ma = a.sum / n; val mb = b.sum / n
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      val va = a.map(x => (x - ma) * (x - ma)).sum
      val vb = b.map(y => (y - mb) * (y - mb)).sum
      cov / math.sqrt(va * vb)
    }
    rows.foreach { r =>
      val (typ, rho) = (r.getString(0), r.getDouble(2))
      assert(rho >= -1 && rho <= 1, s"$typ rho=$rho")
      val sub = data.filter(_._1 == typ)
      val rx = avgRanks(sub.map(_._2)); val ry = avgRanks(sub.map(_._3))
      val ref = pearson(sub.map(s => rx(s._2)), sub.map(s => ry(s._3)))
      assert(math.abs(rho - ref) < 1e-5, s"$typ rho=$rho pearson-on-ranks=$ref")
    }
  }

  test("q_x_kendall: tau_b in [-1,1] and matches brute-force pair counting") {
    val rows = run("q_x_kendall").collect()
    assert(rows.nonEmpty)
    val data = Tables.events(spark, sfDir)
      .select(col("event_type"), hour(col("ts")), floor(col("value") / 8).cast("long"))
      .collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
    rows.foreach { r =>
      val (typ, tau) = (r.getString(0), r.getDouble(4))
      assert(tau >= -1 && tau <= 1, s"$typ tau=$tau")
      val sub = data.filter(_._1 == typ).map(s => (s._2, s._3))
      val n = sub.length.toLong
      var c = 0L; var d = 0L; var tx = 0L; var ty = 0L
      var i = 0
      while (i < sub.length) {
        var j = i + 1
        while (j < sub.length) {
          val ((xa, ya), (xb, yb)) = (sub(i), sub(j))
          if (xa == xb && ya == yb) { tx += 1; ty += 1 } // counted in both tie terms
          else if (xa == xb) tx += 1
          else if (ya == yb) ty += 1
          else if ((xa < xb) == (ya < yb)) c += 1
          else d += 1
          j += 1
        }
        i += 1
      }
      val n0 = n * (n - 1) / 2
      val ref = (c - d).toDouble / math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
      assert(math.abs(tau - ref) < 1e-5, s"$typ tau=$tau brute=$ref (c=$c d=$d)")
    }
  }

  test("q_x_isotonic: fit is monotone nondecreasing and weighted-mean-preserving") {
    val rows = run("q_x_isotonic").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.length > 1)
    val sorted = rows.sortBy(_._1)
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 <= b._5 + 1e-9, s"fit not monotone at sv=${b._1}: ${a._5} > ${b._5}")
    }
    sorted.foreach { r => assert(r._5 >= -1e-9 && r._5 <= 1 + 1e-9, s"fit ${r._5} outside [0,1]") }
    // PAV preserves the weighted mean of the response
    val wRaw = sorted.map(r => r._3.toDouble).sum // total positives
    val wFit = sorted.map(r => r._5 * r._2).sum
    assert(math.abs(wRaw - wFit) < 1e-3 * sorted.map(_._2).sum,
      s"PAV fit not mean-preserving: pos=$wRaw fitMass=$wFit")
    // fit never pools ACROSS what monotone raw rates already satisfy:
    // isotonic solution must have SSE <= raw rates' SSE vs any constant — weak
    // sanity only; the oracle pins exact values.
  }

  test("q_x_linreg: coefficients match a driver-side normal-equation solve; r2 in [0,1]") {
    val r = run("q_x_linreg").head()
    val (n, b0, b1, b2, r2) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(r2 >= 0 && r2 <= 1, s"r2=$r2")
    val data = Tables.table(spark, sfDir, "documents")
      .select(col("n_chars").cast("double"),
        size(split(col("text"), " ")).cast("double"),
        length(regexp_replace(col("text"), "[^aeiou]", "")).cast("double"))
      .collect().map(x => (x.getDouble(0), x.getDouble(1), x.getDouble(2)))
    assert(data.length.toLong == n)
    // least squares via 3x3 normal equations, solved with Gaussian elimination
    val (sy, s1, s2) = (data.map(_._1).sum, data.map(_._2).sum, data.map(_._3).sum)
    val s11 = data.map(d => d._2 * d._2).sum; val s12 = data.map(d => d._2 * d._3).sum
    val s22 = data.map(d => d._3 * d._3).sum; val s1y = data.map(d => d._2 * d._1).sum
    val s2y = data.map(d => d._3 * d._1).sum
    val m = Array(
      Array(n.toDouble, s1, s2, sy),
      Array(s1, s11, s12, s1y),
      Array(s2, s12, s22, s2y))
    // gaussian elimination with partial pivoting
    for (p <- 0 until 3) {
      val piv = (p until 3).maxBy(i => math.abs(m(i)(p)))
      val t = m(p); m(p) = m(piv); m(piv) = t
      for (i <- p + 1 until 3) {
        val f = m(i)(p) / m(p)(p)
        for (j <- p to 3) m(i)(j) -= f * m(p)(j)
      }
    }
    val x = new Array[Double](3)
    for (i <- 2 to 0 by -1) {
      x(i) = (m(i)(3) - (i + 1 until 3).map(j => m(i)(j) * x(j)).sum) / m(i)(i)
    }
    assert(math.abs(b0 - x(0)) < 1e-4, s"b0=$b0 ref=${x(0)}")
    assert(math.abs(b1 - x(1)) < 1e-4, s"b1=$b1 ref=${x(1)}")
    assert(math.abs(b2 - x(2)) < 1e-4, s"b2=$b2 ref=${x(2)}")
  }

  test("q_x_holt: final level/trend match a driver-side recurrence fold") {
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val finals = rows.groupBy(r => (r._1, r._2)).toSeq.flatMap { case ((_, typ), rs) =>
      val sorted = rs.sortBy(r => (r._3, r._4))
      if (sorted.length < 2) None
      else {
        var l = sorted.head._5; var b = 0.0
        sorted.tail.foreach { r =>
          val l2 = 0.3 * r._5 + 0.7 * (l + b)
          b = 0.2 * (l2 - l) + 0.8 * b
          l = l2
        }
        Some((typ, l, b))
      }
    }
    val expected = finals.groupBy(_._1).map { case (typ, fs) =>
      typ -> ((fs.size.toLong, fs.map(_._2).sum / fs.size, fs.map(_._3).sum / fs.size))
    }
    val got = run("q_x_holt").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (typ, (nS, lvl, tr)) =>
      val (en, el, et) = expected(typ)
      assert(nS == en, s"$typ n_series $nS != $en")
      assert(math.abs(lvl - el) < 1e-5, s"$typ avg_level $lvl != $el")
      assert(math.abs(tr - et) < 1e-5, s"$typ avg_trend $tr != $et")
    }
  }

  test("q_x_interp: rmse >= mae and errors live inside the value envelope") {
    val mm = Tables.events(spark, sfDir)
      .agg(min(col("value")), max(col("value"))).head()
    val span = mm.getDouble(1) - mm.getDouble(0)
    val rows = run("q_x_interp").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (typ, n, mae, rmse) = (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(n > 0)
      assert(rmse + 1e-9 >= mae, s"$typ rmse=$rmse < mae=$mae")
      // |value - interpolation of two in-range neighbors| <= 2 * span
      assert(mae <= 2 * span + 1e-9, s"$typ mae=$mae escapes envelope span=$span")
    }
  }
}
