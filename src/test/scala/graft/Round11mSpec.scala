package graft

/** ROC/Youden invariants: monotone curves, the flagged row is the
  * argmax, and the J identity holds per row.
  */
class Round11mSpec extends SparkSuite {

  test("youden: tpr/fpr nonincreasing in threshold; best row is the J argmax") {
    val rows = SparkEntry.queries("q_x_youden")(spark, sfDir).collect()
      .sortBy(_.getDouble(0))
    assert(rows.nonEmpty)
    rows.zip(rows.drop(1)).foreach { case (lo, hi) =>
      assert(hi.getDouble(2) <= lo.getDouble(2) + 1e-9, "tpr nonincreasing")
      assert(hi.getDouble(3) <= lo.getDouble(3) + 1e-9, "fpr nonincreasing")
    }
    rows.foreach { r =>
      assert(math.abs(r.getDouble(4) - (r.getDouble(2) - r.getDouble(3))) < 2e-6,
        "J = TPR - FPR")
      assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1)
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
    }
    val jmax = rows.map(_.getDouble(4)).max
    val best = rows.filter(_.getBoolean(5))
    assert(best.length == 1, "exactly one optimal threshold")
    assert(math.abs(best.head.getDouble(4) - jmax) < 1e-9)
    val tied = rows.filter(r => math.abs(r.getDouble(4) - jmax) < 1e-12)
    assert(best.head.getDouble(0) == tied.map(_.getDouble(0)).min,
      "ties resolve to the lowest threshold")
  }
}
