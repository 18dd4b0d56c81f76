package graft

import org.apache.spark.sql.functions._

/** Round-14 queries vs independent driver recomputes: banded DTW
  * against a textbook cell-at-a-time banded DP (not the prefix-min
  * unroll), generalized ESD against a literal remove-loop, plus the
  * family axioms (band can only raise DTW; ESD rounds remove distinct
  * days; the no-banded-path pair surfaces NULL, not a dropped row).
  */
class Round14Spec extends SparkSuite {

  private val W = 14
  private val Inf = Long.MaxValue / 4

  private def dailySeries(dir: String): Map[String, Array[Long]] =
    Tables.table(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("event_type"), col("day"))
      .collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toArray).toMap

  /** Textbook banded DP, cell at a time (independent algorithm). */
  private def bandDtwRef(x: Array[Long], y: Array[Long], w: Int): Option[Long] = {
    if (math.abs(x.length - y.length) > w) return None
    var prev = Array.fill(y.length + 1)(Inf)
    for (i <- 1 to x.length) {
      val cur = Array.fill(y.length + 1)(Inf)
      for (j <- math.max(1, i - w) to math.min(y.length, i + w)) {
        val c = math.abs(x(i - 1) - y(j - 1))
        if (i == 1 && j == 1) cur(j) = c
        else {
          val best = math.min(prev(j), math.min(prev(j - 1), cur(j - 1)))
          if (best < Inf / 2) cur(j) = c + best
        }
      }
      prev = cur
    }
    if (prev(y.length) < Inf / 2) Some(prev(y.length)) else None
  }

  /** Literal 3-round ESD remove-loop (declared rules). */
  private def esdRef(s: Array[(String, Long)]): Seq[(Long, String, Long, Double)] = {
    var pts = s.toVector
    (1 to 3).flatMap { rnd =>
      val n = pts.length
      if (n < 3) None
      else {
        val sc = pts.map(_._2).sum
        val sq = pts.map(p => p._2 * p._2).sum
        val mean = sc.toDouble / n
        val sd = math.sqrt((sq - sc.toDouble * sc / n) / (n - 1))
        if (!(sd > 0)) None
        else {
          val pick = pts.minBy { case (d, c) => (-math.abs(c - mean), d) }
          pts = pts.filterNot(_._1 == pick._1)
          Some((rnd.toLong, pick._1,
            pick._2, math.abs(pick._2 - mean) / sd))
        }
      }
    }
  }

  private def dailyWithDays(dir: String): Map[String, Array[(String, Long)]] =
    Tables.table(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), (r.get(1).toString, r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toArray).toMap

  /** Fixture with a length mismatch ABOVE the band (30 vs 9 days):
    * the (longrun, shortrun) pair has no banded path at w = 14 and
    * must surface with NULL dtw_band.
    */
  private lazy val mismatchDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("r14_band_sf").toString
    import spark.implicits._
    def day(d: String) = java.sql.Timestamp.valueOf(d + " 12:00:00")
    val rows =
      (for (i <- 1 to 30; _ <- 1 to (i % 4) + 1)
        yield ("longrun", day(f"2024-03-$i%02d"))) ++
      (for (i <- 1 to 9; _ <- 1 to (i % 3) + 1)
        yield ("shortrun", day(f"2024-04-$i%02d")))
    rows.toDF("event_type", "ts").write.parquet(s"$dir/events.parquet")
    dir
  }

  test("q_x_dtw_band matches an independent textbook banded DP on every fixture pair") {
    val rows = SparkEntry.queries("q_x_dtw_band")(spark, sfDir).collect()
    val ser = dailySeries(sfDir)
    assert(rows.length == ser.size * (ser.size - 1) / 2)
    rows.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      bandDtwRef(ser(ta), ser(tb), W) match {
        case Some(exp) =>
          assert(!r.isNullAt(4) && r.getLong(4) == exp,
            s"dtw_band($ta, $tb) = ${r.get(4)}, ref $exp")
          val norm = math.round(exp.toDouble / (ser(ta).length + ser(tb).length) * 1e6) / 1e6
          assert(math.abs(r.getDouble(5) - norm) < 1e-9)
        case None =>
          assert(r.isNullAt(4) && r.isNullAt(5), s"expected NULL for ($ta, $tb)")
      }
    }
  }

  test("q_x_dtw_band: banding can only raise the distance (>= unbanded q_x_dtw)") {
    val banded = SparkEntry.queries("q_x_dtw_band")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    val free = SparkEntry.queries("q_x_dtw")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(banded.keySet == free.keySet)
    banded.foreach { case (k, vOpt) =>
      vOpt.foreach(v => assert(v >= free(k), s"band lowered dtw for $k"))
    }
  }

  test("q_x_dtw_band: |n_a - n_b| > w surfaces as a NULL row, not a dropped pair") {
    val out = SparkEntry.queries("q_x_dtw_band")(spark, mismatchDir).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getString(0) == "longrun" && r.getString(1) == "shortrun")
    assert(r.getLong(2) == 30 && r.getLong(3) == 9)
    assert(r.isNullAt(4) && r.isNullAt(5))
    // and the reference agrees there is no banded path
    val ser = dailySeries(mismatchDir)
    assert(bandDtwRef(ser("longrun"), ser("shortrun"), W).isEmpty)
  }

  test("q_x_esd matches a literal 3-round remove-loop; rounds remove distinct days") {
    val rows = SparkEntry.queries("q_x_esd")(spark, sfDir).collect()
    val ser = dailyWithDays(sfDir)
    val byType = rows.groupBy(_.getString(0))
    ser.foreach { case (t, s) =>
      val exp = esdRef(s)
      val got = byType.getOrElse(t, Array.empty).sortBy(_.getLong(1))
      assert(got.length == exp.length, s"rounds($t): ${got.length} vs ${exp.length}")
      got.zip(exp).foreach { case (r, (rnd, day, c, stat)) =>
        assert(r.getLong(1) == rnd && r.getString(2) == day && r.getLong(3) == c,
          s"esd($t, round $rnd)")
        assert(math.abs(r.getDouble(4) - math.round(stat * 1e6) / 1e6) < 1e-9,
          s"r_stat($t, round $rnd)")
      }
      assert(got.map(_.getString(2)).distinct.length == got.length,
        s"esd($t) removed a day twice")
    }
  }

  // --- Fligner–Killeen / Ansari–Bradley references ---

  /** Acklam Φ⁻¹ — the declared approximation, ported literally. */
  private def qnormAcklam(u: Double): Double =
    if (u <= 0.97575) {
      val q = u - 0.5; val r = q * q
      (((((-39.69683028665376 * r + 220.9460984245205) * r - 275.9285104469687) * r
        + 138.357751867269) * r - 30.66479806614716) * r + 2.506628277459239) * q /
        (((((-54.47609879822406 * r + 161.5858368580409) * r - 155.6989798598866) * r
          + 66.80131188771972) * r - 13.28068155288572) * r + 1)
    } else {
      val q = math.sqrt(-2 * math.log(1 - u))
      -(((((-0.007784894002430293 * q - 0.3223964580411365) * q - 2.400758277161838) * q
        - 2.549732539343734) * q + 4.374664141464968) * q + 2.938163982698783) /
        ((((0.007784695709041462 * q + 0.3224671290700398) * q + 2.445134137142996) * q
          + 3.754408661907416) * q + 1)
    }

  /** Independent ground truth for Φ⁻¹: bisection on a Simpson-rule
    * integral of the normal density (step ~3e-4 ⇒ quadrature error
    * far below the 2e-8 tolerance being asserted).
    */
  private def qnormTrue(u: Double): Double = {
    def cdf(x: Double): Double = {
      val lo = -12.0
      val n = 40000
      val h = (x - lo) / n
      var sum = 0.0
      var i = 0
      while (i <= n) {
        val t = lo + i * h
        val wgt = if (i == 0 || i == n) 1.0 else if (i % 2 == 1) 4.0 else 2.0
        sum += wgt * math.exp(-t * t / 2)
        i += 1
      }
      sum * h / 3 / math.sqrt(2 * math.Pi)
    }
    var lo = 0.0; var hi = 10.0
    var it = 0
    while (it < 60) { val m = (lo + hi) / 2; if (cdf(m) < u) lo = m else hi = m; it += 1 }
    (lo + hi) / 2
  }

  test("the declared Acklam inverse-normal approximation is within 2e-8 of ground truth") {
    Seq(0.500001, 0.6, 0.75, 0.9, 0.97, 0.97575, 0.976, 0.99, 0.9999).foreach { u =>
      assert(math.abs(qnormAcklam(u) - qnormTrue(u)) < 2e-8, s"qnorm($u)")
    }
  }

  private def docLens(dir: String): Array[(String, Long)] =
    Tables.table(spark, dir, "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))

  test("q_x_fligner matches a driver FK recompute through the declared Acklam scores") {
    val rows = SparkEntry.queries("q_x_fligner")(spark, sfDir).collect()
    val raw = docLens(sfDir)
    val bySrc = raw.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def med(v: Array[Long]): Double = {
      val s = v.sorted
      if (s.length % 2 == 1) s(s.length / 2).toDouble
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val meds = bySrc.map { case (s, v) => s -> med(v) }
    val pool = raw.map { case (s, x) => (s, math.abs(x - meds(s))) }
    val n = pool.length
    val totByD = pool.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val dSorted = totByD.keys.toArray.sorted
    val cumb = dSorted.scanLeft(0L)((acc, d) => acc + totByD(d)).init
      .zip(dSorted).map { case (c, d) => d -> c }.toMap
    def score(d: Double): Double =
      qnormAcklam(0.5 + (2 * cumb(d) + totByD(d) + 1).toDouble / (4.0 * (n + 1)))
    val cells = pool.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val srcs = bySrc.keys.toArray.sorted
    val sa = srcs.map { s =>
      s -> dSorted.flatMap(d => cells.get((s, d)).map(c => c * score(d))).sum
    }.toMap
    val abar = srcs.map(sa).sum / n
    val v2 = srcs.flatMap(s => dSorted.flatMap(d =>
      cells.get((s, d)).map(c => c * math.pow(score(d) - abar, 2)))).sum / (n - 1)
    val chi2 = srcs.map(s => bySrc(s).length * math.pow(sa(s) / bySrc(s).length - abar, 2)).sum / v2
    assert(rows.length == srcs.length)
    rows.foreach { r =>
      val s = r.getString(0)
      assert(r.getLong(1) == bySrc(s).length)
      assert(math.abs(r.getDouble(2) - sa(s) / bySrc(s).length) < 1e-6, s"a_mean($s)")
      assert(math.abs(r.getDouble(3) - chi2) < 1e-4, s"chi2($s): ${r.getDouble(3)} vs $chi2")
      assert(r.getLong(4) == srcs.length - 1)
    }
  }

  test("q_x_ansari matches an exact-integer pooled-midrank recompute") {
    val rows = SparkEntry.queries("q_x_ansari")(spark, sfDir).collect()
    val raw = docLens(sfDir)
    val n = raw.length
    val tot = raw.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val vs = tot.keys.toArray.sorted
    val cumb = vs.scanLeft(0L)((acc, v) => acc + tot(v)).init
      .zip(vs).map { case (c, v) => v -> c }.toMap
    def a2(v: Long): Long = {
      val r2 = 2 * cumb(v) + tot(v) + 1
      math.min(r2, 2L * (n + 1) - r2)
    }
    val per = raw.groupBy(_._1).view.mapValues { xs =>
      (xs.length.toLong, xs.map(p => a2(p._2)).sum)
    }.toMap
    assert(rows.length == per.size)
    rows.foreach { r =>
      val s = r.getString(0)
      assert(r.getLong(1) == per(s)._1, s"n($s)")
      assert(r.getLong(2) == per(s)._2, s"a2($s)")
      val (ni, aa2) = per(s)
      val e = ni * (n + 2) / 4.0
      val vr = ni.toDouble * (n - ni) * (n + 2) * (n - 2) / (48.0 * (n - 1))
      val zRef = (aa2 / 2.0 - e) / math.sqrt(vr) // fixture N is even
      assert(n % 2 == 0 && math.abs(r.getDouble(3) - math.round(zRef * 1e6) / 1e6) < 1e-6)
    }
  }

  test("ansari axiom: AB scores peak at the pooled middle and fall at both tails") {
    // a tight-middle sample gets HIGHER total score than an
    // extreme-tails sample of the same size from the same pool
    val n = 100
    // untied midrank of value v over the distinct pool 1..100 is v: 2r = 2v
    def score(v: Long) = math.min(2 * v, 2L * (n + 1) - 2 * v)
    val middle = (46L to 55L).map(score).sum
    val tails = ((1L to 5L) ++ (96L to 100L)).map(score).sum
    assert(middle > tails)
  }

  test("q_x_esd unmasks: a planted pair of adjacent spikes is fully recovered by rounds 1+2") {
    // two big outliers close in value mask each other for single-pass
    // Grubbs-style max-|z| logic once one inflates the sd; the ESD
    // remove-loop must still surface both in the first two rounds.
    val base = (1 to 28).map(i => (f"2024-05-$i%02d", 10L + (i % 3)))
    val planted = base.updated(9, ("2024-05-10", 90L)).updated(19, ("2024-05-20", 88L))
    val exp = esdRef(planted.toArray)
    assert(exp.take(2).map(_._2).toSet == Set("2024-05-10", "2024-05-20"))
  }
}
