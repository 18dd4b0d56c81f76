package graft

import org.apache.spark.sql.functions._

/** Sharp invariants of the robust-summary wave — exact driver
  * recomputes against sorted per-source samples.
  */
class Round11hSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def lens(): Map[String, Seq[Long]] =
    Tables.table(spark, sfDir, "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap

  // min v with 100*rank >= p*n over the sorted sample
  private def q(sorted: Seq[Long], p: Int): Long = {
    val n = sorted.length
    sorted.zipWithIndex.collectFirst {
      case (v, i) if (i + 1) * 100 >= p.toLong * n => v
    }.get
  }

  test("quantiles: monotone bands; every source matches the sorted-sample rule") {
    val rows = run("q_x_quantiles").collect()
    val ls = lens()
    assert(rows.length == ls.size)
    rows.foreach { r =>
      val s = ls(r.getString(0))
      val expect = Seq(10, 25, 50, 75, 90).map(q(s, _))
      val got = (1 to 5).map(r.getLong(_))
      assert(got == expect, s"${r.getString(0)}: $got vs $expect")
      assert(got == got.sorted, "bands monotone")
    }
  }

  test("iqr_outliers matches a driver recompute of the Tukey rule") {
    val rows = run("q_x_iqr_outliers").collect()
    val ls = lens()
    rows.foreach { r =>
      val s = ls(r.getString(0))
      val (q1, q3) = (q(s, 25), q(s, 75))
      assert(r.getLong(1) == q1 && r.getLong(2) == q3)
      val iqr = q3 - q1
      val expect = s.count(v => v * 2 < q1 * 2 - iqr * 3 || v * 2 > q3 * 2 + iqr * 3)
      assert(r.getLong(4) == expect.toLong, s"${r.getString(0)} outliers")
    }
  }

  test("trimmed_mean matches a driver recompute; bounded by min/max") {
    val rows = run("q_x_trimmed_mean").collect()
    val ls = lens()
    rows.foreach { r =>
      val s = ls(r.getString(0))
      val k = s.length / 10
      val kept = s.slice(k, s.length - k)
      val expect = kept.sum.toDouble / kept.length
      assert(math.abs(r.getDouble(3) - expect) < 1e-5,
        s"${r.getString(0)}: ${r.getDouble(3)} vs $expect")
      assert(r.getLong(2) == k.toLong)
    }
  }
}
