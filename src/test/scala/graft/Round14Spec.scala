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
