package graft

import org.apache.spark.sql.functions._

/** Sharp invariants of the round-11 governance/audit wave — exact
  * driver recomputes where the statistic is closed-form, structural
  * invariants (conservation, monotonicity, definition bounds) for the
  * table-shaped outputs.
  */
class Round11cSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def docs() =
    Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))

  test("k_anon: classes partition the corpus; at_risk iff size < 5") {
    val rows = run("q_x_k_anon").collect()
    val n = Tables.table(spark, sfDir, "documents").count()
    assert(rows.map(_.getLong(3)).sum == n, "QI classes must partition the corpus")
    rows.foreach(r => assert(r.getBoolean(4) == (r.getLong(3) < 5)))
  }

  test("l_diversity: l_count <= class_size and <= distinct langs; partition holds") {
    val rows = run("q_x_l_diversity").collect()
    val n = Tables.table(spark, sfDir, "documents").count()
    val nl = Tables.table(spark, sfDir, "documents")
      .select(col("lang")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == n)
    rows.foreach { r =>
      assert(r.getLong(3) >= 1 && r.getLong(3) <= math.min(r.getLong(2), nl))
      assert(r.getBoolean(4) == (r.getLong(3) < 2))
    }
  }

  test("fairness: confusion rates match a driver recompute; gaps are max-min") {
    val rows = run("q_x_fairness").collect()
    // recompute per-source selection rate from the same lang-id rule
    val langId = SparkEntry.queries("q_x_lang_id")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getString(2) == "en")).toMap
    val ds = docs()
    val bySrc = ds.groupBy(_._4)
    assert(rows.length == bySrc.size)
    rows.foreach { r =>
      val g = bySrc(r.getString(0))
      val sel = g.count(t => langId(t._1))
      val pos = g.count(_._3 == "en")
      val tp = g.count(t => t._3 == "en" && langId(t._1))
      assert(r.getLong(1) == g.length)
      assert(math.abs(r.getDouble(2) - sel.toDouble / g.length) < 1e-5,
        s"sel_rate for ${r.getString(0)}")
      if (pos > 0)
        assert(math.abs(r.getDouble(3) - tp.toDouble / pos) < 1e-5,
          s"tpr for ${r.getString(0)}")
    }
    val selRates = rows.map(_.getDouble(2))
    assert(math.abs(rows.head.getDouble(5) - (selRates.max - selRates.min)) < 1e-5,
      "parity gap must be the max-min spread of selection rates")
  }

  test("wasserstein matches a driver recompute on one pair; symmetric-free and nonneg") {
    val rows = run("q_x_wasserstein").collect()
    val k = Tables.table(spark, sfDir, "documents")
      .select(col("source")).distinct().count().toInt
    assert(rows.length == k * (k - 1) / 2, "every unordered source pair once")
    rows.foreach(r => assert(r.getDouble(2) >= 0))
    val (sa, sb) = (rows.head.getString(0), rows.head.getString(1))
    val ds = docs()
    def cdfSteps(src: String): Map[Long, Double] = {
      val vs = ds.filter(_._4 == src).map(_._5)
      val n = vs.length.toDouble
      vs.groupBy(identity).view.mapValues(_.length / n).toMap
    }
    val (fa, fb) = (cdfSteps(sa), cdfSteps(sb))
    val grid = (fa.keySet ++ fb.keySet).toSeq.sorted
    var (cua, cub, w1) = (0.0, 0.0, 0.0)
    grid.zip(grid.tail).foreach { case (v, nx) =>
      cua += fa.getOrElse(v, 0.0); cub += fb.getOrElse(v, 0.0)
      w1 += math.abs(cua - cub) * (nx - v)
    }
    assert(math.abs(rows.head.getDouble(2) - w1) < 1e-4,
      s"w1 ${rows.head.getDouble(2)} != driver $w1 for ($sa,$sb)")
  }

  test("cluster_eval matches exact pair counts from a driver recompute") {
    val r = run("q_x_cluster_eval").collect().head
    val ds = docs()
    val ka = ds.map(t => t._2.split(" ").distinct.sorted.mkString(" "))
    val kb = ds.map(t => t._2.split(" ").take(10).mkString(" "))
    def pairs(keys: Array[String]): Long =
      keys.groupBy(identity).values.map(g => g.length.toLong * (g.length - 1) / 2).sum
    val both = ka.zip(kb).groupBy(identity).values
      .map(g => g.size.toLong * (g.size - 1) / 2).sum
    assert(r.getLong(0) == ds.length)
    assert(r.getLong(3) == pairs(ka), s"pairs_true ${r.getLong(3)} != ${pairs(ka)}")
    assert(r.getLong(4) == pairs(kb), s"pairs_pred ${r.getLong(4)} != ${pairs(kb)}")
    assert(r.getLong(5) == both)
    // recall = both / pairs_true when defined
    if (pairs(ka) > 0)
      assert(math.abs(r.getDouble(7) - both.toDouble / pairs(ka)) < 1e-5)
  }

  test("clustering_coef: cc in [0,1]; triangle counts consistent with the census") {
    val rows = run("q_x_clustering_coef").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (deg, ntri, cc) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(cc >= 0.0 && cc <= 1.0 + 1e-9, s"cc out of range: $r")
      assert(ntri <= deg * (deg - 1) / 2, "more triangles than neighbor pairs")
      assert(math.abs(cc - 2.0 * ntri / (deg * (deg - 1))) < 1e-5)
    }
    // total per-vertex triangle incidences = 3 * triangle census
    val totalTri = SparkEntry.queries("q_x_triangles")(spark, sfDir)
      .agg(sum(col("n_tri"))).collect().head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == totalTri,
      "per-vertex incidences must sum to the census total")
  }

  test("gtest matches an exact driver recompute") {
    val r = run("q_x_gtest").collect().head
    val ds = docs()
    val cells = ds.groupBy(t => (t._3, t._4)).view.mapValues(_.length).toMap
    val rowm = ds.groupBy(_._3).view.mapValues(_.length).toMap
    val colm = ds.groupBy(_._4).view.mapValues(_.length).toMap
    val n = ds.length.toDouble
    val g = 2.0 * cells.map { case ((l, s), o) =>
      o * math.log(o * n / (rowm(l).toDouble * colm(s)))
    }.sum
    assert(math.abs(r.getDouble(1) - g) < 1e-4, s"G ${r.getDouble(1)} != $g")
    assert(r.getLong(2) == (rowm.size - 1).toLong * (colm.size - 1))
  }

  test("cochran_armitage matches an exact driver recompute") {
    val r = run("q_x_cochran_armitage").collect().head
    val ds = docs()
    val bt = ds.map(t => (math.min(t._5 / 200, 9L), if (t._3 == "en") 1L else 0L))
    val n = bt.length.toDouble
    val rr = bt.map(_._2).sum.toDouble
    val srt = bt.collect { case (t, 1L) => t }.sum.toDouble
    val snt = bt.map(_._1).sum.toDouble
    val snt2 = bt.map(t => t._1 * t._1).sum.toDouble
    val z = (srt - rr * snt / n) /
      math.sqrt(rr / n * (1 - rr / n) * (snt2 - snt * snt / n))
    assert(math.abs(r.getDouble(2) - z) < 1e-5, s"z ${r.getDouble(2)} != $z")
  }

  test("neyman: allocations track Nh*Sh and never exceed the budget") {
    val rows = run("q_x_neyman").collect()
    val ds = docs()
    val bySrc = ds.groupBy(_._4)
    def sd(vs: Array[Long]): Double = {
      val m = vs.map(_.toDouble).sum / vs.length
      math.sqrt(vs.map(v => (v - m) * (v - m)).sum / (vs.length - 1))
    }
    val weights = bySrc.view.mapValues(g => g.length * sd(g.map(_._5))).toMap
    val tot = weights.values.sum
    rows.foreach { r =>
      val expect = math.floor(1000.0 * weights(r.getString(0)) / tot).toLong
      assert(r.getLong(4) == expect, s"alloc for ${r.getString(0)}")
    }
    assert(rows.map(_.getLong(4)).sum <= 1000, "floor allocations stay within budget")
  }

  test("nelson_aalen: hazard is nonneg nondecreasing per cohort and >= -ln(KM survival)... consistent") {
    val na = run("q_x_nelson_aalen").collect()
    assert(na.nonEmpty)
    na.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val o = rs.sortBy(_.getLong(1))
      o.map(_.getDouble(4)).sliding(2).foreach {
        case Array(a, b) => assert(b >= a - 1e-9, "cumulative hazard must not decrease")
        case _ =>
      }
      assert(o.head.getDouble(4) >= 0)
    }
    // cross-estimator sanity vs q_x_survival on the same risk sets:
    // while survival > 0, H_NA <= -ln(S_KM) (AM-GM per factor), and
    // the risk-set columns agree row for row
    val km = run("q_x_survival").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(5))).toMap
    na.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      assert(km.contains(key), s"risk-set row $key missing from KM")
      assert(km(key)._1 == r.getLong(2), s"n_at_risk disagrees at $key")
      val s = km(key)._2
      if (s > 0)
        assert(r.getDouble(4) <= -math.log(s) + 1e-6,
          s"H=${r.getDouble(4)} exceeds -ln(S)=${-math.log(s)} at $key")
    }
  }
}
