package graft

import org.apache.spark.sql.functions._

/** Sharp invariants of the distribution-distance wave — metric
  * axioms, cross-statistic consistency with q_x_wasserstein/q_x_ks,
  * and an exact driver recompute for one pair of each statistic.
  */
class Round11gSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def lengthsBySource(): Map[String, Seq[Long]] =
    Tables.table(spark, sfDir, "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  test("energy distance: nonnegative; one pair matches an O(n^2) driver recompute") {
    val rows = run("q_x_energy_dist").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) >= -1e-9, "energy distance >= 0"))
    val ls = lengthsBySource()
    val h = rows.head
    val (xs, ys) = (ls(h.getString(0)), ls(h.getString(1)))
    def meanAbs(a: Seq[Long], b: Seq[Long]): Double =
      a.flatMap(x => b.map(y => math.abs(x - y).toDouble)).sum / (a.length.toLong * b.length)
    val d2 = 2 * meanAbs(xs, ys) - meanAbs(xs, xs) - meanAbs(ys, ys)
    assert(math.abs(h.getDouble(2) - d2) < 1e-4, s"energy recompute: $d2")
  }

  test("cvm: nonnegative; one pair matches a pooled-observation driver recompute") {
    val rows = run("q_x_cvm").collect()
    rows.foreach(r => assert(r.getDouble(2) >= -1e-9))
    val ls = lengthsBySource()
    val h = rows.head
    val (xs, ys) = (ls(h.getString(0)).sorted, ls(h.getString(1)).sorted)
    val (na, nb) = (xs.length.toDouble, ys.length.toDouble)
    def cdf(s: Seq[Long], v: Long): Double = s.count(_ <= v) / s.length.toDouble
    val pooled = (xs ++ ys)
    val sum2 = pooled.map(v => math.pow(cdf(xs, v) - cdf(ys, v), 2)).sum
    val t = na * nb / math.pow(na + nb, 2) * sum2
    assert(math.abs(h.getDouble(2) - t) < 1e-4, s"cvm recompute: $t")
  }

  test("kuiper: V >= KS D for every pair; one pair matches a driver recompute") {
    val kuiper = run("q_x_kuiper").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val ls = lengthsBySource()
    val h = kuiper.head
    val (xs, ys) = (ls(h._1._1), ls(h._1._2))
    val grid = (xs ++ ys).distinct.sorted
    def cdf(s: Seq[Long], v: Long): Double = s.count(_ <= v) / s.length.toDouble
    val dpos = grid.map(v => cdf(xs, v) - cdf(ys, v)).max.max(0.0)
    val dneg = grid.map(v => cdf(ys, v) - cdf(xs, v)).max.max(0.0)
    assert(math.abs(h._2 - (dpos + dneg)) < 1e-5, s"kuiper recompute: ${dpos + dneg}")
    // V dominates the one-sided sup distance
    assert(h._2 >= math.max(dpos, dneg) - 1e-9)
  }
}
