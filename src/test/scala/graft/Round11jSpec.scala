package graft

import org.apache.spark.sql.functions._

/** Sharp invariants of the pipeline-tuning wave — monotonicity of the
  * sweep, S-curve probability axioms, and a closed-form recompute of
  * the planner.
  */
class Round11jSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("dedup_sweep: counts nonincreasing in threshold; 0.6 row equals allpairs") {
    val rows = run("q_x_dedup_sweep").collect().sortBy(_.getDouble(0))
    assert(rows.length == 5)
    rows.zip(rows.drop(1)).foreach { case (lo, hi) =>
      assert(hi.getLong(1) <= lo.getLong(1), "pairs nonincreasing")
      assert(hi.getLong(2) <= lo.getLong(2), "docs nonincreasing")
    }
    val at06 = rows.find(r => math.abs(r.getDouble(0) - 0.6) < 1e-9).get
    val allpairs = run("q_x_allpairs_jaccard").count()
    assert(at06.getLong(1) == allpairs, "0.6 sweep row == q_x_allpairs_jaccard")
  }

  test("lsh_curve: p in [0,1], increasing in sim and b; balance point pinned") {
    val rows = run("q_x_lsh_curve").collect()
    assert(rows.length == 3 * 2 * 19)
    rows.foreach(r => assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    rows.groupBy(r => (r.getInt(0), r.getInt(1))).foreach { case (_, rs) =>
      val ps = rs.sortBy(_.getDouble(2)).map(_.getDouble(3))
      ps.zip(ps.drop(1)).foreach { case (a, b) => assert(b >= a - 1e-12) }
    }
    // closed-form spot check: b=16, r=4, s=0.5 -> 1-(1-0.0625)^16
    val spot = rows.find(r => r.getInt(0) == 16 && r.getInt(1) == 4 &&
      math.abs(r.getDouble(2) - 0.5) < 1e-9).get
    assert(math.abs(spot.getDouble(3) - (1.0 - math.pow(1.0 - 0.0625, 16))) < 1e-6)
    assert(math.abs(spot.getDouble(4) - math.pow(1.0 / 16, 0.25)) < 1e-6)
  }

  test("sample_size matches the closed form; bigger deltas need fewer samples") {
    val rows = run("q_x_sample_size").collect()
    rows.filter(r => !r.isNullAt(3)).foreach { r =>
      val (p1, p2) = (r.getDouble(1), r.getDouble(2))
      val expect = math.ceil(math.pow(1.959964 + 0.841621, 2) *
        (p1 * (1 - p1) + p2 * (1 - p2)) / math.pow(p1 - p2, 2)).toLong
      // 6dp-rounded p1/p2 vs exact: allow the rounding to move ceil by a hair
      assert(math.abs(r.getLong(3) - expect) <= math.max(1L, expect / 1000),
        s"${r.getString(0)}: ${r.getLong(3)} vs $expect")
    }
  }
}
