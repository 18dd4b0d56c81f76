package graft

import org.apache.spark.sql.functions._

/** Sharp invariants of the round-11 wave — properties beyond the
  * oracle hash (which proves equality, not sanity): exact driver
  * recomputes for the closed-form statistics, structural bounds for
  * the rest.
  */
class Round11Spec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("rake: no stopwords in output, degree >= frequency, ordered by score") {
    val stops = Set("a", "the", "and", "of", "to", "in", "is", "on")
    val rows = run("q_x_rake").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!stops(r.getString(0)), s"stopword ${r.getString(0)} in keywords")
      assert(r.getLong(1) >= r.getLong(2), "deg < freq impossible (phrases are non-empty)")
      assert(r.getDouble(3) >= 1.0, "score = deg/freq >= 1 by construction")
    }
    rows.map(_.getDouble(3)).sliding(2)
      .foreach { case Array(a, b) => assert(a >= b); case _ => }
  }

  test("pr_curve: ap in (0,1], label prevalences partition the corpus") {
    val rows = run("q_x_pr_curve").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) > 0 && r.getDouble(1) <= 1.0, s"ap out of range: $r")
    }
    val n = Tables.table(spark, sfDir, "embeddings").count()
    assert(rows.map(_.getLong(2)).sum == n, "one-vs-rest positives must partition N")
  }

  test("brier: Murphy decomposition closes up to within-bin variance/covariance") {
    // brier = (rel − res + unc) + E[var(p|bin)] − 2·E[cov(p,y|bin)];
    // the residual terms are bounded by (w/2)² and 2·(w/2)·(1/2) for
    // bin width w = 0.1 → |gap| ≤ 0.0025 + 0.05; observed gaps are
    // ~1e-4, assert the safe envelope
    run("q_x_brier").collect().foreach { r =>
      val (b, rel, res, unc) = (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val gap = b - (rel - res + unc)
      assert(math.abs(gap) <= 0.0525 + 1e-5,
        s"decomposition gap $gap outside the binning envelope for $r")
      assert(unc <= 0.25 + 1e-9, "uncertainty maxes at 0.25")
    }
  }

  test("cochran_q matches an exact driver recompute") {
    val r = run("q_x_cochran_q").collect().head
    val xs = Tables.table(spark, sfDir, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).take(3).map(x => if (x > 0) 1L else 0L))
    val g = (0 until 3).map(j => xs.map(_(j)).sum)
    val t = g.sum
    val l2 = xs.map(v => { val l = v.sum; l * l }).sum
    val expect = 2.0 * (3 * g.map(x => x * x).sum - t * t) / (3 * t - l2)
    assert(math.abs(r.getDouble(1) - expect) < 1e-5,
      s"Q ${r.getDouble(1)} != driver $expect")
  }

  test("friedman matches an exact driver recompute") {
    val r = run("q_x_friedman").collect().head
    val vs = Tables.table(spark, sfDir, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).take(4).map(_.toDouble))
    val n = vs.length
    val rs = (0 until 4).map { j =>
      vs.map { v =>
        1.0 + v.indices.filter(_ != j).count(m => v(m) < v(j)) +
          0.5 * v.indices.filter(_ != j).count(m => v(m) == v(j))
      }.sum
    }
    val expect = 12.0 / (n * 4 * 5) * rs.map(x => x * x).sum - 3.0 * n * 5
    assert(math.abs(r.getDouble(1) - expect) < 1e-5)
  }

  test("hill matches an exact driver recompute over the top-101 cut") {
    val r = run("q_x_hill").collect().head
    val top = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(x => (x.getLong(1), x.getLong(0)))
      .sortBy { case (c, id) => (-c, id) }.take(101)
    val xk = top.last._1.toDouble
    val h = top.take(100).map(t => math.log(t._1 / xk)).sum / 100
    assert(r.getLong(0) == 100)
    assert(math.abs(r.getDouble(1) - h) < 1e-5, s"h ${r.getDouble(1)} != $h")
    assert(r.getDouble(2) > 0, "tail index must be positive")
  }

  test("mahalanobis: top-20 ordered desc; the max matches a driver recompute") {
    val rows = run("q_x_mahalanobis").collect()
    assert(rows.length == 20)
    rows.map(_.getDouble(2)).sliding(2)
      .foreach { case Array(a, b) => assert(a >= b); case _ => }
    val vecs = Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val dims = vecs.head._2.length
    val mu = (0 until dims).map(j => vecs.map(_._2(j)).sum / vecs.length)
    val v = (0 until dims).map(j =>
      vecs.map(x => x._2(j) * x._2(j)).sum / vecs.length - mu(j) * mu(j))
    val best = vecs.map { case (_, x) =>
      (0 until dims).map(j => (x(j) - mu(j)) * (x(j) - mu(j)) / v(j)).sum
    }.max
    assert(math.abs(rows.head.getDouble(2) - best) < 1e-4,
      s"top md2 ${rows.head.getDouble(2)} != driver max $best")
  }

  test("balanced_sample: every label keeps exactly the min class count") {
    val e = Tables.table(spark, sfDir, "embeddings")
    val counts = e.groupBy(col("label")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nmin = counts.values.min
    val kept = run("q_x_balanced_sample").collect()
      .groupBy(_.getInt(0)).view.mapValues(_.length.toLong).toMap
    assert(kept.keySet == counts.keySet, "every label must survive")
    kept.foreach { case (l, k) => assert(k == nmin, s"label $l kept $k != $nmin") }
  }

  test("stl_anomaly: every flagged day clears the 2.5-sigma bound; flags are sparse") {
    val rows = run("q_x_stl_anomaly").collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2)) > 2.5 * r.getDouble(3), s"under-threshold flag $r")
    }
    val nDays = Tables.table(spark, sfDir, "events")
      .select(col("event_type"), to_date(col("ts"))).distinct().count()
    assert(rows.length <= nDays / 5,
      s"${rows.length} anomalies of $nDays series-days — not sparse, threshold broken")
  }

  test("lorenz: monotone, ends at 1, never above the equality diagonal") {
    val rows = run("q_x_lorenz").collect()
    assert(rows.length == 10)
    val shares = rows.sortBy(_.getLong(0)).map(_.getDouble(2))
    shares.sliding(2).foreach { case Array(a, b) => assert(b >= a - 1e-9); case _ => }
    assert(math.abs(shares.last - 1.0) < 1e-9, "full population holds all mass")
    rows.sortBy(_.getLong(0)).zipWithIndex.foreach { case (r, i) =>
      assert(r.getDouble(2) <= (i + 1) / 10.0 + 1e-6,
        "Lorenz curve cannot exceed the equality line")
    }
  }
}
