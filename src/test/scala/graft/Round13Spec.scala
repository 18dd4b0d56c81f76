package graft

import org.apache.spark.sql.functions._

/** q_x_dtw invariants: every pair's distance matches an independent
  * driver-side O(n·m) textbook DP (no prefix-min unroll — a different
  * algorithm for the same recurrence), plus the DTW axioms the
  * prefix-min identity could silently break: identical series ⇒ 0,
  * symmetry, and DTW ≤ the lag-locked L1 distance on equal-length
  * series (warping can only help).
  */
class Round13Spec extends SparkSuite {

  private def dailySeries(): Map[String, Array[Long]] =
    Tables.table(spark, sfDir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("event_type"), col("day"))
      .collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toArray).toMap

  /** (epoch_day, count) series per type — for the calendar-keyed
    * recomputes (holt_winters slots, theil_sen day denominators).
    */
  private def dailySeriesWithDays(dir: String): Map[String, Array[(Long, Long)]] =
    Tables.table(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"),
        datediff(col("day"), lit("1970-01-01").cast("date")).cast("long").as("ed"),
        col("c"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toArray).toMap

  /** Independent epoch-slot Holt–Winters fold (declared constants). */
  private def hwRef(s: Array[(Long, Long)]): (Double, Double, Double) = {
    var l = s.take(7).map(_._2).sum.toDouble / 7
    var b = 0.0
    val sv = Array.fill(7)(0.0)
    var i = 0
    while (i < 7) { sv((s(i)._1 % 7).toInt) = s(i)._2 - l; i += 1 }
    while (i < s.length) {
      val idx = (s(i)._1 % 7).toInt
      val c = s(i)._2
      val l2 = 0.3 * (c - sv(idx)) + 0.7 * (l + b)
      b = 0.1 * (l2 - l) + 0.9 * b
      sv(idx) = 0.2 * (c - l2) + 0.8 * sv(idx)
      l = l2
      i += 1
    }
    (l, b, l + b + sv(((s.last._1 + 1) % 7).toInt))
  }

  /** Independent calendar-x Theil–Sen (x = days since first day + 1). */
  private def tsRef(s: Array[(Long, Long)]): (Long, Double, Double) = {
    val x0 = s.head._1 - 1
    val xs = s.map(p => (p._1 - x0, p._2))
    val slopes = (for (i <- xs.indices; j <- i + 1 until xs.length)
      yield (xs(j)._2 - xs(i)._2).toDouble / (xs(j)._1 - xs(i)._1)).sorted
    def med(v: Seq[Double]) =
      if (v.length % 2 == 1) v(v.length / 2)
      else (v(v.length / 2 - 1) + v(v.length / 2)) / 2
    val slope = med(slopes)
    val icept = med(xs.map(p => p._2 - slope * p._1).sorted)
    (slopes.length.toLong, slope, icept)
  }

  /** Synthetic calendar-gap fixture: "gap" = 20 days minus Jan 10
    * (the missing-day case the r13 advice flagged), "sparse" = 9 days
    * (one w=7 R/S block, zero w=14 blocks). Per-day counts vary so
    * every block has nonzero variance.
    */
  private lazy val gapDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("r14_gap_sf").toString
    import spark.implicits._
    def day(d: String) = java.sql.Timestamp.valueOf(d + " 12:00:00")
    val rows =
      (for (i <- 1 to 20 if i != 10; _ <- 1 to (i % 5) + 1)
        yield ("gap", day(f"2024-01-$i%02d"))) ++
      (for (i <- 1 to 9; _ <- 1 to (i % 3) + 1)
        yield ("sparse", day(f"2024-02-$i%02d")))
    rows.toDF("event_type", "ts").write.parquet(s"$dir/events.parquet")
    dir
  }

  /** Textbook row-sweep DP, cell at a time — deliberately NOT the
    * prefix-min unroll the query uses.
    */
  private def dtwRef(x: Array[Long], y: Array[Long]): Long = {
    val inf = Long.MaxValue / 4
    var prev = Array.fill(y.length + 1)(inf)
    for (i <- 1 to x.length) {
      val cur = Array.fill(y.length + 1)(inf)
      for (j <- 1 to y.length) {
        val c = math.abs(x(i - 1) - y(j - 1))
        cur(j) =
          if (i == 1 && j == 1) c
          else c + math.min(prev(j), math.min(prev(j - 1), cur(j - 1)))
      }
      prev = cur
    }
    prev(y.length)
  }

  test("q_x_dtw matches an independent textbook DP on every fixture pair") {
    val rows = SparkEntry.queries("q_x_dtw")(spark, sfDir).collect()
    val ser = dailySeries()
    val nPairs = ser.size * (ser.size - 1) / 2
    assert(rows.length == nPairs, s"expected all $nPairs pairs, got ${rows.length}")
    rows.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      assert(ta < tb, s"pair order: $ta !< $tb")
      val expected = dtwRef(ser(ta), ser(tb))
      assert(r.getLong(4) == expected,
        s"dtw($ta, $tb) = ${r.getLong(4)}, ref $expected")
      assert(r.getLong(2) == ser(ta).length && r.getLong(3) == ser(tb).length)
      val norm = math.round(expected.toDouble / (ser(ta).length + ser(tb).length) * 1e6) / 1e6
      assert(math.abs(r.getDouble(5) - norm) < 1e-9, s"dtw_norm($ta, $tb)")
    }
  }

  test("q_x_page_hinkley matches an independent driver fold; PH is nonneg and max-consistent") {
    val rows = SparkEntry.queries("q_x_page_hinkley")(spark, sfDir).collect()
    val ser = dailySeries()
    assert(rows.length == ser.size)
    rows.foreach { r =>
      val cs = ser(r.getString(0))
      var sum = 0L; var m = 0.0; var mn = Double.MaxValue; var ph = 0.0
      cs.zipWithIndex.foreach { case (c, i) =>
        sum += c
        m += c - sum.toDouble / (i + 1) - 0.5
        mn = math.min(mn, m)
        ph = math.max(ph, m - mn)
      }
      assert(r.getLong(1) == cs.length)
      assert(math.abs(r.getDouble(2) - math.round(ph * 1e6) / 1e6) < 1e-9,
        s"ph_max(${r.getString(0)})")
      assert(math.abs(r.getDouble(3) - math.round(m * 1e6) / 1e6) < 1e-9,
        s"m_final(${r.getString(0)})")
      assert(r.getDouble(2) >= 0.0, "PH is a max of nonnegative gaps")
    }
  }

  test("q_x_holt_winters matches an independent driver fold at the declared constants") {
    val rows = SparkEntry.queries("q_x_holt_winters")(spark, sfDir).collect()
    val ser = dailySeriesWithDays(sfDir)
    val eligible = ser.filter(_._2.length >= 8)
    assert(rows.length == eligible.size)
    rows.foreach { r =>
      val s = ser(r.getString(0))
      val (l, b, fc) = hwRef(s)
      def r6(x: Double) = math.round(x * 1e6) / 1e6
      assert(r.getLong(1) == s.length)
      assert(math.abs(r.getDouble(2) - r6(l)) < 1e-9, s"level(${r.getString(0)})")
      assert(math.abs(r.getDouble(3) - r6(b)) < 1e-9, s"trend(${r.getString(0)})")
      assert(math.abs(r.getDouble(4) - r6(fc)) < 1e-9, s"fc_next(${r.getString(0)})")
    }
  }

  test("q_x_holt_winters: a missing day does not phase-shift the seasonal tail (gap fixture)") {
    val out = SparkEntry.queries("q_x_holt_winters")(spark, gapDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val ser = dailySeriesWithDays(gapDir)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    Seq("gap", "sparse").foreach { t =>
      val (l, b, fc) = hwRef(ser(t))
      val r = out(t)
      assert(math.abs(r.getDouble(2) - r6(l)) < 1e-9, s"level($t)")
      assert(math.abs(r.getDouble(3) - r6(b)) < 1e-9, s"trend($t)")
      assert(math.abs(r.getDouble(4) - r6(fc)) < 1e-9, s"fc_next($t)")
    }
    // the observation-index fold (the r13 bug) disagrees on the gap
    // series: every post-gap slot shifts by one, so the epoch-keyed
    // result is genuinely different — this test cannot pass both.
    val s = ser("gap")
    var l = s.take(7).map(_._2).sum.toDouble / 7
    var b = 0.0
    val sv = Array.tabulate(7)(i => s(i)._2 - l)
    (7 until s.length).foreach { i =>
      val idx = i % 7
      val l2 = 0.3 * (s(i)._2 - sv(idx)) + 0.7 * (l + b)
      b = 0.1 * (l2 - l) + 0.9 * b
      sv(idx) = 0.2 * (s(i)._2 - l2) + 0.8 * sv(idx)
      l = l2
    }
    assert(math.abs(out("gap").getDouble(4) - r6(l + b + sv(s.length % 7))) > 1e-9,
      "gap fixture should distinguish calendar slots from index slots")
  }

  test("q_x_jonckheere: j2 matches a driver pair count; monotone series maxes the statistic") {
    val rows = SparkEntry.queries("q_x_jonckheere")(spark, sfDir).collect()
    val dc = Tables.table(spark, sfDir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"),
        floor(datediff(col("day"), lit("1970-01-01").cast("date")) / lit(7.0))
          .cast("long").as("wk"), col("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val groups = dc(r.getString(0)).groupBy(_._2).toSeq.sortBy(_._1)
        .map(_._2.map(_._3).toSeq)
      val j2 = (for {
        (ga, i) <- groups.zipWithIndex; (gb, j) <- groups.zipWithIndex if i < j
        x <- ga; y <- gb
      } yield if (x < y) 2L else if (x == y) 1L else 0L).sum
      assert(r.getLong(3) == j2, s"j2(${r.getString(0)})")
      assert(r.getLong(1) == groups.length && r.getLong(2) == groups.map(_.length).sum)
    }
    // axiom: a strictly increasing cross-week series attains the max
    // j2 = 2 * sum_{i<j} n_i*n_j, and the z formula is positive there
    val inc = Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(5L, 6L))
    val maxJ2 = 2L * (for {
      (ga, i) <- inc.zipWithIndex; (gb, j) <- inc.zipWithIndex if i < j
    } yield ga.length.toLong * gb.length).sum
    val gotJ2 = (for {
      (ga, i) <- inc.zipWithIndex; (gb, j) <- inc.zipWithIndex if i < j
      x <- ga; y <- gb
    } yield if (x < y) 2L else if (x == y) 1L else 0L).sum
    assert(gotJ2 == maxJ2)
  }

  test("q_x_pettitt matches a brute-force cut scan") {
    val rows = SparkEntry.queries("q_x_pettitt")(spark, sfDir).collect()
    val dayRows = Tables.table(spark, sfDir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("event_type"), col("day"))
      .collect().map(r => (r.getString(0), r.get(1).toString, r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val s = dayRows(r.getString(0)).sortBy(_._2)
      val cs = s.map(_._3); val days = s.map(_._2)
      // brute force: U_t summed over the full (i <= t < j) pair set
      val best = (1 until cs.length).map { t =>
        val u = (for (i <- 0 until t; j <- t until cs.length)
          yield java.lang.Long.signum(cs(i) - cs(j)).toLong).sum
        (math.abs(u), days(t - 1))
      }.minBy { case (au, d) => (-au, d) }
      assert(r.getLong(2) == best._1, s"k_stat(${r.getString(0)})")
      assert(r.getString(3) == best._2, s"cp_day(${r.getString(0)})")
      val n = cs.length.toDouble
      val p = math.round(2 * math.exp(-6.0 * best._1 * best._1 /
        (n * n * n + n * n)) * 1e6) / 1e6
      assert(math.abs(r.getDouble(4) - p) < 1e-9)
    }
  }

  test("q_x_theil_sen matches a driver median-of-slopes; robust to one planted outlier") {
    val rows = SparkEntry.queries("q_x_theil_sen")(spark, sfDir).collect()
    val ser = dailySeriesWithDays(sfDir)
    rows.foreach { r =>
      val (nPairs, slope, icept) = tsRef(ser(r.getString(0)))
      def r6(x: Double) = math.round(x * 1e6) / 1e6
      assert(r.getLong(2) == nPairs)
      assert(math.abs(r.getDouble(3) - r6(slope)) < 1e-9, s"slope(${r.getString(0)})")
      assert(math.abs(r.getDouble(4) - r6(icept)) < 1e-9, s"icept(${r.getString(0)})")
    }
    // robustness axiom: one wild outlier moves the Theil-Sen slope of
    // a clean linear series by little, while the OLS slope jumps
    val clean = (1 to 20).map(i => 2.0 * i)
    val dirty = clean.updated(9, 1000.0)
    def tsSlope(ys: Seq[Double]) = {
      val sl = (for (i <- ys.indices; j <- i + 1 until ys.length)
        yield (ys(j) - ys(i)) / (j - i)).sorted
      if (sl.length % 2 == 1) sl(sl.length / 2)
      else (sl(sl.length / 2 - 1) + sl(sl.length / 2)) / 2
    }
    assert(math.abs(tsSlope(dirty) - 2.0) < 0.2, s"ts slope ${tsSlope(dirty)}")
  }

  test("q_x_theil_sen: slopes are per CALENDAR day across a gap (gap fixture)") {
    val out = SparkEntry.queries("q_x_theil_sen")(spark, gapDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val ser = dailySeriesWithDays(gapDir)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    Seq("gap", "sparse").foreach { t =>
      val (nPairs, slope, icept) = tsRef(ser(t))
      assert(out(t).getLong(2) == nPairs)
      assert(math.abs(out(t).getDouble(3) - r6(slope)) < 1e-9, s"slope($t)")
      assert(math.abs(out(t).getDouble(4) - r6(icept)) < 1e-9, s"icept($t)")
    }
  }

  test("q_x_mood_median matches a driver recompute; counts are median-consistent") {
    val rows = SparkEntry.queries("q_x_mood_median")(spark, sfDir).collect()
    val raw = Tables.table(spark, sfDir, "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val sortedV = raw.map(_._2).sorted
    val gm =
      if (sortedV.length % 2 == 1) sortedV(sortedV.length / 2).toDouble
      else (sortedV(sortedV.length / 2 - 1) + sortedV(sortedV.length / 2)) / 2.0
    val bySrc = raw.groupBy(_._1)
    val aTot = raw.count(_._2 > gm); val nTot = raw.length
    var chi2 = 0.0
    bySrc.keys.toSeq.sorted.foreach { src =>
      val n = bySrc(src).length; val a = bySrc(src).count(_._2 > gm)
      val ea = n.toDouble * aTot / nTot
      chi2 += math.pow(a - ea, 2) / ea + math.pow((n - a) - (n - ea), 2) / (n - ea)
    }
    rows.foreach { r =>
      val src = r.getString(0)
      assert(r.getLong(1) == bySrc(src).length)
      assert(r.getLong(2) == bySrc(src).count(_._2 > gm), s"n_above($src)")
      assert(math.abs(r.getDouble(4) - math.round(chi2 * 1e6) / 1e6) < 1e-9)
      assert(r.getLong(5) == bySrc.size - 1)
    }
  }

  test("q_x_page_trend: 2L matches a driver rank recompute; monotone weeks max the L") {
    val rows = SparkEntry.queries("q_x_page_trend")(spark, sfDir).collect()
    val ser = Tables.table(spark, sfDir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.get(1).toString, r.getLong(2)))
      .groupBy(_._1)
    val epoch = java.time.LocalDate.parse("1970-01-01")
    rows.foreach { r =>
      val weeks = ser(r.getString(0))
        .groupBy(x => java.time.temporal.ChronoUnit.DAYS
          .between(epoch, java.time.LocalDate.parse(x._2)) / 7)
        .filter(_._2.length == 7)
      var l2 = 0L
      weeks.values.foreach { wkRows =>
        val cs = wkRows.sortBy(_._2).map(_._3)
        cs.zipWithIndex.foreach { case (c, i) =>
          val lo = 1 + cs.count(_ < c); val hi = cs.count(_ <= c)
          l2 += (i + 1).toLong * (lo + hi)
        }
      }
      assert(r.getLong(1) == weeks.size, s"b(${r.getString(0)})")
      assert(r.getLong(2) == l2, s"l2(${r.getString(0)})")
    }
    // axiom: strictly increasing within-week series attains the exact
    // maximum 2L = 2b * sum(j*j) = 2b * 140 at k = 7
    val inc = Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L)
    val l2max = inc.zipWithIndex.map { case (c, i) =>
      val lo = 1 + inc.count(_ < c); val hi = inc.count(_ <= c)
      (i + 1).toLong * (lo + hi)
    }.sum
    assert(l2max == 2L * (1 to 7).map(j => j * j).sum)
  }

  test("q_x_hurst matches a driver R/S recompute at both declared windows") {
    val rows = SparkEntry.queries("q_x_hurst")(spark, sfDir).collect()
    val ser = dailySeries()
    rows.foreach { r =>
      val cs = ser(r.getString(0))
      def meanRs(w: Int): Double = {
        val vals = (0 until cs.length / w).flatMap { k =>
          val blk = cs.slice(k * w, (k + 1) * w)
          val sc = blk.sum; val sq = blk.map(x => x * x).sum
          val sDev = math.sqrt((sq - sc.toDouble * sc / w) / w)
          if (sDev <= 0) None
          else {
            var pf = 0L
            val xs = blk.zipWithIndex.map { case (x, i) =>
              pf += x; pf - (i + 1) * (sc.toDouble / w)
            }
            Some((xs.max - xs.min) / sDev)
          }
        }
        vals.sum / vals.length
      }
      val (r7, r14) = (meanRs(7), meanRs(14))
      val h = (math.log(r14) - math.log(r7)) / (math.log(14) - math.log(7))
      def r6(x: Double) = math.round(x * 1e6) / 1e6
      assert(r.getLong(1) == cs.length)
      assert(math.abs(r.getDouble(2) - r6(r7)) < 1e-9, s"rs7(${r.getString(0)})")
      assert(math.abs(r.getDouble(3) - r6(r14)) < 1e-9, s"rs14(${r.getString(0)})")
      assert(math.abs(r.getDouble(4) - r6(h)) < 1e-9, s"hurst(${r.getString(0)})")
    }
  }

  test("q_x_hurst surfaces 7 <= n_days < 14 types with null rs14/hurst (gap fixture)") {
    val out = SparkEntry.queries("q_x_hurst")(spark, gapDir).collect()
      .map(r => r.getString(0) -> r).toMap
    // "sparse" (9 days): one w=7 block exists, no w=14 block — the row
    // must SURFACE with null rs14/hurst, not silently drop (r13 advice)
    assert(out.contains("sparse"), "sparse type dropped from q_x_hurst output")
    assert(!out("sparse").isNullAt(2) && out("sparse").isNullAt(3)
      && out("sparse").isNullAt(4))
    // "gap" (19 days): both windows populated
    assert(!out("gap").isNullAt(3) && !out("gap").isNullAt(4))
  }

  test("dtw axioms: zero on identical series, symmetric, <= lag-locked L1") {
    val ser = dailySeries()
    ser.values.foreach(s => assert(dtwRef(s, s) == 0L))
    val ts = ser.keys.toSeq.sorted
    for (a <- ts; b <- ts if a < b) {
      val d = dtwRef(ser(a), ser(b))
      assert(d == dtwRef(ser(b), ser(a)), s"asymmetric: $a/$b")
      if (ser(a).length == ser(b).length) {
        val l1 = ser(a).zip(ser(b)).map { case (x, y) => math.abs(x - y) }.sum
        assert(d <= l1, s"dtw $d above lag-locked L1 $l1 for $a/$b")
      }
    }
  }
}
