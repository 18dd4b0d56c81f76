package graft

import org.apache.spark.sql.functions._

/** Invariants of the §2.8d round-10 wave (queries/Round10.scala)
  * beyond the DuckDB oracle hash — each test recomputes the statistic
  * with an independent driver-side reference on sf0.001 (the Stats
  * Spec pattern), so a both-engines-wrong-the-same-way refactor still
  * fails here.
  */
class Round10Spec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def docsData(): Array[(String, Long)] =
    Tables.table(spark, sfDir, "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))

  test("q_x_levene matches a driver-side Brown-Forsythe computation") {
    val r = run("q_x_levene").head()
    val (k, n, w) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(w >= 0)
    val data = docsData()
    val groups = data.groupBy(_._1).values.map(_.map(_._2.toDouble)).toSeq
    assert(groups.size.toLong == k && data.length.toLong == n)
    def median(v: Seq[Double]): Double = {
      val s = v.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val zs = groups.map { g => val m = median(g); g.map(x => math.abs(x - m)) }
    val grand = zs.flatten.sum / n
    val ssb = zs.map(z => z.size * math.pow(z.sum / z.size - grand, 2)).sum
    val ssw = zs.map(z => { val m = z.sum / z.size; z.map(x => math.pow(x - m, 2)).sum }).sum
    val ref = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(w - ref) < 1e-4, s"W=$w brute=$ref")
  }

  test("q_x_mcnemar matches driver-side discordant-pair counting") {
    val r = run("q_x_mcnemar").head()
    val (n, nb, nc) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nb + nc <= n)
    val rows = Tables.table(spark, sfDir, "embeddings")
      .select(col("label").cast("int"), col("embedding")).collect()
      .map { rr =>
        val y = rr.getInt(0)
        val e = rr.getSeq[Float](1)
        def argmax(lo: Int, len: Int): Int = {
          val sl = e.slice(lo, lo + len)
          sl.indexOf(sl.max)
        }
        (y, argmax(0, 10), argmax(10, 10))
      }
    val refB = rows.count { case (y, pa, pb) => pa == y && pb != y }.toLong
    val refC = rows.count { case (y, pa, pb) => pa != y && pb == y }.toLong
    assert(nb == refB && nc == refC, s"(nb,nc)=($nb,$nc) ref=($refB,$refC)")
    if (nb + nc > 0) {
      val chi2 = r.getDouble(3)
      val ref = math.pow((refB - refC).toDouble, 2) / (refB + refC)
      assert(math.abs(chi2 - ref) < 1e-6)
    }
  }

  test("q_x_cohens_d matches a driver-side pooled-SD effect size") {
    val data = docsData()
    val all = data.map(_._2.toDouble)
    run("q_x_cohens_d").collect().foreach { r =>
      val (src, dGot) = (r.getString(0), r.getDouble(3))
      val xs = data.filter(_._1 == src).map(_._2.toDouble)
      val ys = data.filter(_._1 != src).map(_._2.toDouble)
      val (m1, m2) = (xs.sum / xs.size, ys.sum / ys.size)
      val ss1 = xs.map(x => math.pow(x - m1, 2)).sum
      val ss2 = ys.map(x => math.pow(x - m2, 2)).sum
      val pooled = math.sqrt((ss1 + ss2) / (all.length - 2))
      val ref = (m1 - m2) / pooled
      assert(math.abs(dGot - ref) < 1e-5, s"$src d=$dGot ref=$ref")
    }
  }

  test("q_x_lift_rules: symmetric pair counts, symmetric lift, conf consistent") {
    val rows = run("q_x_lift_rules").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((ta, tb), (nab, _, _, lift)) =>
      val rev = rows((tb, ta))
      assert(rev._1 == nab, s"n_ab not symmetric for ($ta,$tb)")
      assert(math.abs(rev._4 - lift) < 1e-5, s"lift not symmetric for ($ta,$tb)")
    }
    // independent recompute of one rule over (user, day) baskets
    val ut = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")), col("event_type")).distinct()
      .collect()
      .map(r => ((r.getLong(0), r.getDate(1).toString), r.getString(2)))
    val types = ut.map(_._2).distinct.sorted
    val (a, b) = (types(0), types(1))
    val ua = ut.filter(_._2 == a).map(_._1).toSet
    val ub = ut.filter(_._2 == b).map(_._1).toSet
    val nU = ut.map(_._1).distinct.length.toLong
    val (nab, _, conf, lift) = rows((a, b))
    assert(nab == (ua & ub).size.toLong)
    assert(math.abs(conf - nab.toDouble / ua.size) < 1e-5)
    assert(math.abs(lift - nab.toDouble * nU / (ua.size.toLong * ub.size)) < 1e-5)
  }

  test("q_x_mann_kendall: S matches brute force and |S| <= n(n-1)/2") {
    val dc = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    run("q_x_mann_kendall").collect().foreach { r =>
      val (typ, nD, s) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(math.abs(s) <= nD * (nD - 1) / 2)
      val series = dc.filter(_._1 == typ).sortBy(_._2).map(_._3)
      assert(series.length.toLong == nD)
      var ref = 0L
      for (i <- series.indices; j <- i + 1 until series.length)
        ref += java.lang.Long.signum(series(j) - series(i))
      assert(s == ref, s"$typ S=$s brute=$ref")
    }
  }

  test("q_x_readability: flesch reproduces from driver-side word/syllable sums") {
    val texts = Tables.table(spark, sfDir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    run("q_x_readability").collect().foreach { r =>
      val (src, nDocs, flesch) = (r.getString(0), r.getLong(1), r.getDouble(4))
      val sub = texts.filter(_._1 == src)
      assert(sub.length.toLong == nDocs)
      val w = sub.map(_._2.split(" ", -1).length.toLong).sum
      val y = sub.map(_._2.split("[^aeiou]+", -1).count(_.nonEmpty).toLong).sum
      val ref = 206.835 - 1.015 * (w.toDouble / nDocs) - 84.6 * (y.toDouble / w)
      assert(math.abs(flesch - ref) < 1e-4, s"$src flesch=$flesch ref=$ref")
    }
  }

  test("q_x_decile_lift partitions all vectors and conserves positives") {
    val tot = Tables.table(spark, sfDir, "embeddings")
      .agg(count(lit(1)), sum(when(col("label") <= 4, 1L).otherwise(0L))).head()
    val (n, p) = (tot.getLong(0), tot.getLong(1))
    val rows = run("q_x_decile_lift").collect()
    assert(rows.map(_.getLong(1)).sum == n, "deciles lost vectors")
    assert(rows.map(_.getLong(2)).sum == p, "deciles lost positives")
    rows.foreach { r =>
      val (dec, nD, nPos, lift) = (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(4))
      assert(dec >= 0 && dec <= 9)
      val ref = nPos.toDouble * n / (nD.toDouble * p)
      assert(math.abs(lift - ref) < 1e-5)
    }
  }

  test("q_x_js_divergence: bounded [0, ln 2] and matches a driver-side recompute") {
    val data = docsData().map { case (s, nc) => (s, nc / 100) }
    val corpus = data.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val nT = data.length.toLong
    run("q_x_js_divergence").collect().foreach { r =>
      val (src, js) = (r.getString(0), r.getDouble(2))
      assert(js >= -1e-9 && js <= math.log(2) + 1e-9, s"$src js=$js outside [0, ln2]")
      val sub = data.filter(_._1 == src)
      val nS = sub.length.toLong
      val sc = sub.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
      val ref = corpus.keys.map { b =>
        val pp = sc.getOrElse(b, 0L).toDouble / nS
        val qq = corpus(b).toDouble / nT
        val m = (pp + qq) / 2
        (if (pp > 0) 0.5 * pp * math.log(pp / m) else 0.0) + 0.5 * qq * math.log(qq / m)
      }.sum
      assert(math.abs(js - ref) < 1e-5, s"$src js=$js ref=$ref")
    }
  }

  test("q_x_durbin_watson matches a driver-side recompute; dw >= 0") {
    val dc = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    run("q_x_durbin_watson").collect().foreach { r =>
      val (typ, dw) = (r.getString(0), r.getDouble(2))
      assert(dw >= 0, s"$typ dw=$dw")
      val series = dc.filter(_._1 == typ).sortBy(_._2).map(_._3.toDouble)
      val num = series.sliding(2).map(w => (w(1) - w(0)) * (w(1) - w(0))).sum
      val m = series.sum / series.length
      val den = series.map(x => (x - m) * (x - m)).sum
      assert(math.abs(dw - num / den) < 1e-4, s"$typ dw=$dw ref=${num / den}")
    }
  }

  test("q_x_entropy_rate: 0 <= H <= ln(k) and matches driver-side transitions") {
    val r = run("q_x_entropy_rate").head()
    val (nT, k, h) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(h >= -1e-9 && h <= math.log(k.toDouble) + 1e-9)
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(rr => (rr.getLong(0), rr.getTimestamp(1).getTime * 1000L +
        rr.getTimestamp(1).getNanos / 1000 % 1000, rr.getLong(2), rr.getString(3)))
    val trans = ev.groupBy(_._1).values.flatMap { rs =>
      val sorted = rs.sortBy(r2 => (r2._2, r2._3)).map(_._4)
      sorted.zip(sorted.tail)
    }.toSeq
    assert(trans.length.toLong == nT)
    val byPair = trans.groupBy(identity).map { case (pr, xs) => pr -> xs.length.toLong }
    val byFrom = trans.groupBy(_._1).map { case (a, xs) => a -> xs.length.toLong }
    val ref = byPair.map { case ((a, _), nab) =>
      nab * (math.log(byFrom(a).toDouble) - math.log(nab.toDouble))
    }.sum / nT
    assert(math.abs(h - ref) < 1e-5, s"h=$h ref=$ref")
  }

  test("q_x_centroid_assign: every vector assigned once, centroids self-assign") {
    val n = Tables.table(spark, sfDir, "embeddings").count()
    val rows = run("q_x_centroid_assign").collect()
    assert(rows.map(_.getLong(1)).sum == n, "assignment lost vectors")
    rows.foreach { r =>
      assert(r.getDouble(2) == 0.0,
        s"centroid ${r.getLong(0)} min_d2=${r.getDouble(2)} (self-assignment missing)")
    }
  }

  test("q_x_mg_guaranteed equals the exact heavy set (the MG guarantee held)") {
    val toks = Tables.table(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("w")).collect()
      .map(_.getString(0))
    val nTok = toks.length.toLong
    val heavy = toks.groupBy(identity)
      .map { case (w, xs) => w -> xs.length.toLong }
      .filter { case (_, c) => c * 51 > nTok }
    val got = run("q_x_mg_guaranteed").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == heavy,
      s"semi-join dropped guaranteed terms: got=${got.keySet} want=${heavy.keySet}")
  }
}
