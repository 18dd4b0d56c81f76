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
