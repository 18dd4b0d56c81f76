package graft

import org.apache.spark.sql.functions._

/** Sharp invariants of the round-11 wave 2 (k-sample statistical
  * tests + scoring/symbolization/link-prediction) — driver-side
  * recomputes for the closed-form statistics, structural bounds for
  * the table-shaped outputs. The oracle hash proves cross-engine
  * equality; these prove the statistics are the statistics.
  */
class Round11bSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def lensBySource(): Map[String, Array[Long]] =
    Tables.table(spark, sfDir, "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap

  test("kruskal matches an exact driver recompute (mid-ranks + tie correction)") {
    val r = run("q_x_kruskal").collect().head
    val groups = lensBySource()
    val all = groups.values.flatten.toArray.sorted
    val n = all.length
    // mid-rank per value
    val rank = all.groupBy(identity).map { case (v, vs) =>
      val below = all.count(_ < v)
      v -> (below + (vs.length + 1) / 2.0)
    }
    val srb = groups.values.map { g =>
      val rj = g.map(rank).sum; rj * rj / g.length
    }.sum
    val ties = all.groupBy(identity).values
      .map(_.length.toLong).map(t => t * t * t - t).sum
    val h = (12.0 / (n.toDouble * (n + 1)) * srb - 3.0 * (n + 1)) /
      (1.0 - ties.toDouble / (n.toDouble * n * n - n))
    assert(r.getLong(0) == groups.size && r.getLong(1) == n)
    assert(math.abs(r.getDouble(2) - h) < 1e-5, s"H ${r.getDouble(2)} != $h")
  }

  test("bartlett matches an exact driver recompute") {
    val r = run("q_x_bartlett").collect().head
    val groups = lensBySource()
    val k = groups.size
    val n = groups.values.map(_.length).sum
    def s2(g: Array[Long]): Double = {
      val m = g.map(_.toDouble).sum / g.length
      g.map(x => (x - m) * (x - m)).sum / (g.length - 1)
    }
    val sp2 = groups.values.map(g => (g.length - 1) * s2(g)).sum / (n - k)
    val num = (n - k) * math.log(sp2) -
      groups.values.map(g => (g.length - 1) * math.log(s2(g))).sum
    val c = 1.0 + (groups.values.map(g => 1.0 / (g.length - 1)).sum -
      1.0 / (n - k)) / (3.0 * (k - 1))
    assert(math.abs(r.getDouble(2) - num / c) < 1e-5,
      s"T ${r.getDouble(2)} != ${num / c}")
  }

  test("welch_anova matches an exact driver recompute") {
    val r = run("q_x_welch_anova").collect().head
    val groups = lensBySource().values.toArray
    val k = groups.length
    def mv(g: Array[Long]): (Double, Double) = {
      val m = g.map(_.toDouble).sum / g.length
      (m, g.map(x => (x - m) * (x - m)).sum / (g.length - 1))
    }
    val w = groups.map { g => val (m, v) = mv(g); (g.length, m, g.length / v) }
    val sw = w.map(_._3).sum
    val mbar = w.map(t => t._3 * t._2).sum / sw
    val num = w.map(t => t._3 * (t._2 - mbar) * (t._2 - mbar)).sum / (k - 1)
    val lam = w.map(t => math.pow(1.0 - t._3 / sw, 2) / (t._1 - 1)).sum
    val f = num / (1.0 + 2.0 * (k - 2) * lam / (k.toDouble * k - 1))
    val df2 = (k.toDouble * k - 1) / (3.0 * lam)
    assert(math.abs(r.getDouble(1) - f) < 1e-4, s"F ${r.getDouble(1)} != $f")
    assert(math.abs(r.getDouble(3) - df2) < 1e-3)
  }

  test("tukey_hsd: full pair grid, q_stat symmetric recompute on one pair") {
    val rows = run("q_x_tukey_hsd").collect()
    val groups = lensBySource()
    val k = groups.size
    assert(rows.length == k * (k - 1) / 2, "every unordered pair appears once")
    val n = groups.values.map(_.length).sum
    val means = groups.view.mapValues(g => g.map(_.toDouble).sum / g.length).toMap
    val mse = groups.values.map { g =>
      val m = g.map(_.toDouble).sum / g.length
      g.map(x => (x - m) * (x - m)).sum
    }.sum / (n - k)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b, "pairs are ordered")
      val diff = means(a) - means(b)
      assert(math.abs(r.getDouble(2) - diff) < 1e-5)
      val q = math.abs(diff) /
        math.sqrt(mse / 2.0 * (1.0 / groups(a).length + 1.0 / groups(b).length))
      assert(math.abs(r.getDouble(3) - q) < 1e-4, s"q ${r.getDouble(3)} != $q for $a/$b")
    }
  }

  test("jarque_bera matches an exact driver recompute per source") {
    val rows = run("q_x_jarque_bera").collect()
    val groups = lensBySource()
    assert(rows.length == groups.size)
    rows.foreach { r =>
      val g = groups(r.getString(0)).map(_.toDouble)
      val n = g.length
      val m = g.sum / n
      val m2 = g.map(x => math.pow(x - m, 2)).sum / n
      val m3 = g.map(x => math.pow(x - m, 3)).sum / n
      val m4 = g.map(x => math.pow(x - m, 4)).sum / n
      val skew = m3 / math.pow(m2, 1.5)
      val exk = m4 / (m2 * m2) - 3.0
      val jb = n / 6.0 * (skew * skew + exk * exk / 4.0)
      assert(math.abs(r.getDouble(2) - skew) < 1e-4, s"skew for ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - exk) < 1e-4, s"kurt for ${r.getString(0)}")
      assert(math.abs(r.getDouble(4) - jb) < 1e-2 * math.max(1.0, jb),
        s"jb ${r.getDouble(4)} != $jb for ${r.getString(0)}")
    }
  }

  test("partial_corr matches a driver recompute and the defining identity") {
    val r = run("q_x_partial_corr").collect().head
    val xs = Tables.table(spark, sfDir, "documents")
      .select(col("n_chars"), size(split(col("text"), " ")).cast("long"),
        length(regexp_replace(col("text"), "[^aeiou]", "")).cast("long"))
      .collect().map(t => (t.getLong(0).toDouble, t.getLong(1).toDouble, t.getLong(2).toDouble))
    def pearson(a: Array[Double], b: Array[Double]): Double = {
      val n = a.length
      val (ma, mb) = (a.sum / n, b.sum / n)
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      cov / math.sqrt(a.map(x => (x - ma) * (x - ma)).sum *
        b.map(y => (y - mb) * (y - mb)).sum)
    }
    val (x, y, z) = (xs.map(_._1), xs.map(_._2), xs.map(_._3))
    val (rxy, rxz, ryz) = (pearson(x, y), pearson(x, z), pearson(y, z))
    val expect = (rxy - rxz * ryz) /
      math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    assert(math.abs(r.getDouble(1) - rxy) < 1e-5)
    assert(math.abs(r.getDouble(4) - expect) < 1e-5,
      s"partial ${r.getDouble(4)} != $expect")
    // controlling for z must move the correlation (fixture has real vowel mass)
    assert(math.abs(r.getDouble(4) - r.getDouble(1)) > 1e-6)
  }

  test("ridge: coefficients solve the penalized normal equations") {
    val r = run("q_x_ridge").collect().head
    val xs = Tables.table(spark, sfDir, "documents")
      .select(col("n_chars"), size(split(col("text"), " ")).cast("long"),
        length(regexp_replace(col("text"), "[^aeiou]", "")).cast("long"))
      .collect().map(t => (t.getLong(0).toDouble, t.getLong(1).toDouble, t.getLong(2).toDouble))
    val n = xs.length.toDouble
    val lam = r.getDouble(1)
    val (b0, b1, b2) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    // residuals of the three normal equations, relative to their scale
    val e0 = xs.map { case (yv, x1, x2) => yv - b0 - b1 * x1 - b2 * x2 }.sum
    val e1 = xs.map { case (yv, x1, x2) => x1 * (yv - b0 - b1 * x1 - b2 * x2) }.sum -
      lam * b1
    val e2 = xs.map { case (yv, x1, x2) => x2 * (yv - b0 - b1 * x1 - b2 * x2) }.sum -
      lam * b2
    val sy = xs.map(t => math.abs(t._1)).sum
    assert(math.abs(e0) / sy < 1e-3, s"intercept equation residual $e0")
    assert(math.abs(e1) / (sy * 100) < 1e-3, s"x1 equation residual $e1")
    assert(math.abs(e2) / (sy * 100) < 1e-3, s"x2 equation residual $e2")
    assert(lam == 1000.0)
  }

  test("sax: symbols respect the z breakpoints; weekly PAA recomputes") {
    val rows = run("q_x_sax").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (z, sym) = (r.getDouble(3), r.getString(4))
      val expect = if (z < -0.6745) "a" else if (z < 0) "b"
        else if (z < 0.6745) "c" else "d"
      assert(sym == expect, s"symbol $sym for z=$z")
    }
    // per-type z-scores have ~zero mean (they are z-scores of the PAA rows)
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val zm = rs.map(_.getDouble(3)).sum / rs.length
      assert(math.abs(zm) < 0.05, s"z mean $zm for $t not ~0")
    }
  }

  test("rfm: buckets are quintiles — each bucket holds <= ceil(n/5) + tie slack; ordering consistent") {
    val rows = run("q_x_rfm").collect()
    val n = rows.length
    assert(n == Tables.table(spark, sfDir, "events")
      .select(col("user_id")).distinct().count())
    // bucket monotone in the underlying metric: frequency bucket of the
    // max-frequency user is the top bucket among observed ones
    val byFreq = rows.sortBy(_.getLong(2))
    assert(byFreq.last.getLong(5) >= byFreq.head.getLong(5))
    // monotonicity: sort by metric, bucket ids must be non-decreasing
    byFreq.map(_.getLong(5)).sliding(2).foreach {
      case Array(a, b) => assert(b >= a, "frequency bucket not monotone")
      case _ =>
    }
    rows.sortBy(r => r.getDouble(3)).map(_.getLong(6)).sliding(2).foreach {
      case Array(a, b) => assert(b >= a, "monetary bucket not monotone")
      case _ =>
    }
    // recency bucket: HIGHER recency (stale) => higher bucket id, monotone too
    rows.sortBy(_.getLong(1)).map(_.getLong(4)).sliding(2).foreach {
      case Array(a, b) => assert(b >= a, "recency bucket not monotone")
      case _ =>
    }
    assert(rows.map(_.getLong(5)).distinct.length >= 2, "frequency buckets degenerate")
  }

  test("adamic_adar matches a driver recompute of the two-hop scores") {
    val rows = run("q_x_adamic_adar").collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val edges = graft.operators.CosGraph.edges(spark, sfDir, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def aa(a: Long, b: Long): (Int, Double) = {
      val common = adj.getOrElse(a, Set.empty) & adj.getOrElse(b, Set.empty)
      (common.size, common.toSeq.map(w => 1.0 / math.log(adj(w).size)).sum)
    }
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a < b, "pair ids ordered")
      assert(!edges.contains((a, b)) && !edges.contains((b, a)),
        s"($a,$b) is an existing edge — link prediction must exclude it")
      val (nc, score) = aa(a, b)
      assert(r.getLong(2) == nc, s"n_common ${r.getLong(2)} != $nc for ($a,$b)")
      assert(math.abs(r.getDouble(3) - score) < 1e-5,
        s"aa ${r.getDouble(3)} != $score for ($a,$b)")
    }
    // descending by score
    rows.map(_.getDouble(3)).sliding(2)
      .foreach { case Array(a, b) => assert(a >= b); case _ => }
  }
}
