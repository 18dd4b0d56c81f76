package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-10 wave-3 operators (queries/Round10b.scala)
  * — independent driver-side references on sf0.001, the StatsSpec /
  * Round10Spec pattern.
  */
class Round10bSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def dailyCounts(): Map[String, Seq[Long]] =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1).map { case (t, rs) => t -> rs.sortBy(_._2).map(_._3).toSeq }

  private def median(v: Seq[Long]): Double = {
    val s = v.sorted
    if (s.size % 2 == 1) s(s.size / 2).toDouble
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  test("q_x_cusum matches a driver-side fold and max >= final >= 0") {
    val dc = dailyCounts()
    run("q_x_cusum").collect().foreach { r =>
      val (typ, mx, fin) = (r.getString(0), r.getDouble(2), r.getDouble(3))
      assert(mx >= fin - 1e-9 && fin >= 0 && mx >= 0)
      val series = dc(typ)
      val med = median(series)
      var s = 0.0; var sm = 0.0
      series.foreach { c => s = math.max(0, s + (c - med)); sm = math.max(sm, s) }
      assert(math.abs(mx - sm) < 1e-9, s"$typ max=$mx ref=$sm")
      assert(math.abs(fin - s) < 1e-9, s"$typ final=$fin ref=$s")
    }
  }

  test("q_x_runs_test matches driver-side run counting") {
    val dc = dailyCounts()
    run("q_x_runs_test").collect().foreach { r =>
      val (typ, n1, n2, runs) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val series = dc(typ)
      val med = median(series)
      val signs = series.filter(_ != med).map(c => if (c > med) 1 else -1)
      val refRuns = if (signs.isEmpty) 0L
        else 1L + signs.sliding(2).count(w => w.length == 2 && w(0) != w(1))
      assert(n1 == signs.count(_ == 1) && n2 == signs.count(_ == -1))
      assert(runs == refRuns, s"$typ runs=$runs ref=$refRuns")
      assert(runs >= 1 || n1 + n2 == 0)
      assert(runs <= n1 + n2)
    }
  }

  test("q_x_source_jaccard: symmetric-free upper triangle, bounded, one pair verified") {
    val rows = run("q_x_source_jaccard").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((sa, sb), (inter, na, nb, j)) =>
      assert(sa < sb, "pair not in canonical order")
      assert(inter <= math.min(na, nb))
      assert(j >= 0 && j <= 1)
    }
    // independent recompute of one pair in bigram space
    def bigrams(src: String): Set[String] =
      Tables.table(spark, sfDir, "documents")
        .filter(col("source") === src).select(col("text")).collect()
        .flatMap { r => val w = r.getString(0).split(" ", -1)
          w.zip(w.tail).map { case (a, b) => s"$a $b" } }.toSet
    val (a, b) = ("src0", "src1")
    val (ba, bb) = (bigrams(a), bigrams(b))
    val (inter, na, nb, j) = rows((a, b))
    assert(na == ba.size && nb == bb.size && inter == (ba & bb).size)
    assert(math.abs(j - inter.toDouble / (na + nb - inter)) < 1e-6)
  }

  test("q_x_coverage: cumulative share is monotone to 1.0 and conserves terms") {
    val rows = run("q_x_coverage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // rows ordered c desc: cum_terms strictly increasing, share monotone
    rows.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi._1 > lo._1)
      assert(lo._3 > hi._3 && lo._4 >= hi._4 - 1e-9)
    }
    assert(math.abs(rows.last._4 - 1.0) < 1e-9, "final share must be 1.0")
    val vocab = Tables.table(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0)
    assert(rows.last._3 == vocab, "cum_terms must end at the vocabulary size")
  }

  test("q_x_qq_shift matches driver-side integer-rank quantiles") {
    val data = Tables.table(spark, sfDir, "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val xs = data.filter(_._1 == "src0").map(_._2).sorted
    val ys = data.filter(_._1 != "src0").map(_._2).sorted
    def qAt(v: Array[Long], pct: Int): Long = {
      // min value with cum >= ceil(pct/100 * n): rank = ceil(pct*n/100)
      val rank = (pct.toLong * v.length + 99) / 100
      v(rank.toInt - 1)
    }
    val rows = run("q_x_qq_shift").collect()
    assert(rows.length == 19)
    rows.foreach { r =>
      val (pct, vs, vr, sh) = (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(vs == qAt(xs, pct), s"pct=$pct v_src=$vs ref=${qAt(xs, pct)}")
      assert(vr == qAt(ys, pct), s"pct=$pct v_rest=$vr ref=${qAt(ys, pct)}")
      assert(sh == vs - vr)
    }
  }

  test("q_x_simpson matches a driver-side coincidence probability") {
    val tf = Tables.table(spark, sfDir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    run("q_x_simpson").collect().foreach { r =>
      val (src, n, sim) = (r.getString(0), r.getLong(1), r.getDouble(2))
      val cs = tf.filter(_._1 == src).map(_._2)
      assert(cs.sum == n)
      val ref = cs.map(c => c * (c - 1)).sum.toDouble / (n.toDouble * (n - 1))
      assert(math.abs(sim - ref) < 1e-6, s"$src simpson=$sim ref=$ref")
    }
  }

  test("q_x_grubbs matches driver-side extreme deviation over sd") {
    val xs = Tables.table(spark, sfDir, "documents")
      .select(col("n_chars")).collect().map(_.getLong(0).toDouble)
    val n = xs.length
    val m = xs.sum / n
    val sd = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (n - 1))
    val ref = math.max(xs.max - m, m - xs.min) / sd
    val r = run("q_x_grubbs").head()
    assert(r.getLong(0) == n)
    assert(math.abs(r.getDouble(3) - ref) < 1e-5, s"g=${r.getDouble(3)} ref=$ref")
  }
}
