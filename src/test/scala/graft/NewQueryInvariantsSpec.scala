package graft

import org.apache.spark.sql.functions._

/** Sharp invariants of the round-7 query wave — properties the oracle
  * hash can't articulate (it only proves equality, not sanity).
  */
class NewQueryInvariantsSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("feat_hash vectors are unit L2 per doc") {
    val bad = run("q_x_feat_hash")
      .groupBy(col("doc_id"))
      .agg(abs(sum(col("weight") * col("weight")) - 1.0).as("err"))
      .filter(col("err") > 1e-4) // weights round at 6dp; 16 dims
      .count()
    assert(bad == 0, s"$bad docs with non-unit hashed vectors")
  }

  test("pmi pair df bounded by each term's df") {
    val docs = Tables.table(spark, sfDir, "documents")
    val tok = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("t"))
    val df = tok.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val viol = run("q_x_pmi")
      .join(df.select(col("t").as("term_a"), col("df").as("dfa")), "term_a")
      .join(df.select(col("t").as("term_b"), col("df").as("dfb")), "term_b")
      .filter(col("df_ab") > least(col("dfa"), col("dfb")))
      .count()
    assert(viol == 0, s"$viol pairs with df_ab above a member df")
  }

  test("markov transition probabilities row-normalize to 1") {
    val bad = run("q_x_markov")
      .groupBy(col("prev_type")).agg(abs(sum(col("p")) - 1.0).as("err"))
      .filter(col("err") > 1e-4).count() // p rounds at 6dp, |types| terms
    assert(bad == 0)
  }

  test("winsorize clip counts respect the exact-percentile bound") {
    val viol = run("q_x_winsorize")
      // strictly-below-P01 (strictly-above-P99) count is at most
      // ceil(0.01 n) for the exact interpolated percentile
      .filter(col("n_clip_low") > ceil(col("n") * 0.01)
        || col("n_clip_high") > ceil(col("n") * 0.01))
      .count()
    assert(viol == 0)
  }

  test("snapshot_diff contents conserve: old = removed + retained, new = added + retained") {
    val m = run("q_x_snapshot_diff").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = Tables.table(spark, sfDir, "documents")
    def nDistinct(mod: Int) = docs.filter(col("doc_id") % mod =!= 0)
      .select(sha2(col("text"), 256)).distinct().count()
    assert(m.getOrElse("removed", 0L) + m.getOrElse("retained", 0L) == nDistinct(7))
    assert(m.getOrElse("added", 0L) + m.getOrElse("retained", 0L) == nDistinct(5))
  }

  test("bootstrap replicate means bracket the true mean collectively") {
    val docs = Tables.table(spark, sfDir, "documents")
    val trueMean = docs.agg(avg(col("n_chars"))).head().getDouble(0)
    val means = run("q_x_bootstrap").select(col("boot_mean"))
      .collect().map(_.getDouble(0))
    assert(means.length == 20)
    // Poisson(1) resamples of 500 docs: every replicate within ±15%
    // and the replicate average within ±5% of the true mean
    assert(means.forall(m => math.abs(m - trueMean) / trueMean < 0.15))
    assert(math.abs(means.sum / means.length - trueMean) / trueMean < 0.05)
  }

  test("rrf output is a valid per-query ranking") {
    val out = run("q_x_rrf")
    val perQuery = out.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n"), min(col("rank")).as("lo"), max(col("rank")).as("hi"),
        countDistinct(col("rank")).as("nd"))
      .filter(col("n") =!= 10 || col("lo") =!= 1 || col("hi") =!= 10
        || col("nd") =!= 10)
      .count()
    assert(perQuery == 0, "each query must have ranks exactly 1..10")
    assert(out.filter(col("query_id") === col("doc_id")).count() == 0,
      "a query must not retrieve itself")
  }

  test("dup_stats histogram covers the whole corpus") {
    val total = run("q_x_dup_stats").agg(sum(col("n_docs"))).head().getLong(0)
    assert(total == Tables.table(spark, sfDir, "documents").count())
  }

  // ---- round-8 wave ---------------------------------------------------

  test("triangle counts: 3 | sum(n_tri), and every listed vertex has degree >= 2") {
    val out = run("q_x_triangles")
    val s = out.agg(sum(col("n_tri"))).head().getLong(0)
    assert(s % 3 == 0, s"sum of per-vertex counts must be 3x the triangle count, got $s")
    val e = graft.operators.CosGraph.edges(spark, sfDir, 0.3)
    val deg = e.select(col("a").as("vec_id"))
      .unionAll(e.select(col("b").as("vec_id")))
      .groupBy(col("vec_id")).agg(count(lit(1)).as("deg"))
    val tooFew = out.join(deg, Seq("vec_id"), "left")
      .filter(col("deg").isNull || col("deg") < 2).count()
    assert(tooFew == 0, s"$tooFew triangle vertices with degree < 2")
  }

  test("psi and kl divergences are non-negative") {
    assert(run("q_x_psi").filter(col("psi") < -1e-9).count() == 0)
    assert(run("q_x_kl_source").filter(col("kl") < -1e-9).count() == 0)
  }

  test("pareto front: mutually non-dominated and complete") {
    val front = run("q_x_pareto")
      .select(col("doc_id"), col("n_chars"), col("quality"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def dominates(a: (Long, Long, Double), b: (Long, Long, Double)) =
      a._3 >= b._3 && a._2 <= b._2 && (a._3 > b._3 || a._2 < b._2)
    for (a <- front; b <- front if a != b)
      assert(!dominates(a, b), s"$a dominates fellow front member $b")
    // completeness: every non-front doc is dominated by some front doc
    val frontIds = front.map(_._1).toSet
    val docs = Tables.table(spark, sfDir, "documents")
      .withColumn("quality",
        graft.functions.TextFunctions.qualityScore(col("text")))
      .select(col("doc_id"), col("n_chars"), col("quality"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    for (d <- docs if !frontIds(d._1))
      assert(front.exists(f => dominates(f, d)), s"$d escaped the front unbeaten")
  }

  test("priority sample is exactly 100 positive-quality docs") {
    val out = run("q_x_priority_sample").collect()
    val eligible = Tables.table(spark, sfDir, "documents")
      .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
      .filter(col("q") > 0).count()
    assert(out.length == math.min(100L, eligible))
    assert(out.forall(_.getDouble(2) > 0))
  }

  test("dedup cascade only coarsens the jaccard-only clustering") {
    // cascade edges are a superset of the jaccard edges, so any two
    // docs sharing a jaccard cluster must share a cascade cluster
    val jac = run("q_x_dup_clusters")
      .select(col("doc_id"), col("cluster_id").as("jc"))
    val split = run("q_x_dedup_cascade")
      .select(col("doc_id"), col("cluster_id").as("cc"))
      .join(jac, Seq("doc_id"))
      .groupBy(col("jc")).agg(countDistinct(col("cc")).as("n"))
      .filter(col("n") > 1).count()
    assert(split == 0, s"$split jaccard clusters straddle cascade clusters")
  }

  test("kmv containment estimates are probabilities; coverage is monotone in k") {
    val c = run("q_x_kmv_containment")
    assert(c.filter(col("c_est") < 0 || col("c_est") > 1).count() == 0)
    val cov = run("q_x_vocab_coverage").orderBy(col("k"))
      .select(col("coverage")).collect().map(_.getDouble(0))
    assert(cov.sameElements(cov.sorted), "coverage must not decrease with k")
    assert(cov.forall(v => v > 0 && v <= 1))
  }

  test("diversity mean_cos stays in its algebraic range") {
    // (||sum v̂||^2 - n) / (n(n-1)) ∈ [-1/(n-1), 1]
    val bad = run("q_x_diversity")
      .filter(col("mean_cos") > 1.0 + 1e-6 ||
        col("mean_cos") < lit(-1.0) / (col("n") - 1) - 1e-6)
      .count()
    assert(bad == 0)
  }

  test("kmv estimate tracks exact vocabulary jaccard on the fixture") {
    import spark.implicits._
    val sh = Tables.table(spark, sfDir, "documents")
      .select(col("source"), explode(array_distinct(
        graft.functions.TextFunctions.wordNgramsExpr("text", 3))).as("g"))
      .distinct()
    val a = sh.select(col("source").as("sa"), col("g"))
    val b = sh.select(col("source").as("sb"), col("g"))
    val inter = a.join(b, Seq("g")).filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("i"))
    val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val exact = inter
      .join(sizes.select(col("source").as("sa"), col("n").as("na")), Seq("sa"))
      .join(sizes.select(col("source").as("sb"), col("n").as("nb")), Seq("sb"))
      .select(col("sa"), col("sb"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("j"))
      .as[(String, String, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val est = run("q_x_kmv_overlap")
      .select(col("source_a"), col("source_b"), col("j_est"))
      .as[(String, String, Double)].collect()
    assert(est.nonEmpty)
    val errs = est.map { case (x, y, e) => math.abs(e - exact.getOrElse((x, y), 0.0)) }
    val mae = errs.sum / errs.length
    assert(mae < 0.05, s"kmv MAE $mae vs exact jaccard")
  }

  test("auc is a probability and pos/neg counts partition the corpus") {
    import spark.implicits._
    val n = Tables.table(spark, sfDir, "embeddings").count()
    val rows = run("q_x_auc")
      .select(col("auc"), col("n_pos"), col("n_neg"))
      .as[(Double, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (auc, p, ng) =>
      assert(auc >= 0.0 && auc <= 1.0, s"auc $auc outside [0,1]")
      assert(p + ng == n, s"pos $p + neg $ng != corpus $n")
    }
    // isotropic fixture: dim-1 score carries no label signal, so
    // one-vs-rest AUC must hover near chance — a sharp sanity check
    // that the rank identity isn't inverted or off-by-one
    rows.foreach { case (auc, _, _) =>
      assert(math.abs(auc - 0.5) < 0.15, s"auc $auc far from chance on isotropic labels") }
  }

  test("acf is a correlation in [-1,1] with lag-consistent pair counts") {
    import spark.implicits._
    val rows = run("q_x_acf")
      .select(col("event_type"), col("lag_k"), col("acf"), col("n_pairs"))
      .as[(String, Int, Option[Double], Long)].collect()
    assert(rows.nonEmpty)
    // acf is NULL (both engines) when a lag has <2 pairs or zero variance
    rows.flatMap(_._3).foreach { a =>
      assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9, s"acf $a outside [-1,1]") }
    // n_pairs strictly decreases as lag grows within a type (k rows
    // fall off the front of the series)
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val byLag = rs.sortBy(_._2).map(_._4).toSeq
      byLag.sliding(2).filter(_.size == 2).foreach { p =>
        assert(p(1) == p(0) - 1,
          s"$t: pair counts ${p(0)} -> ${p(1)} not one-step decreasing") }
    }
  }

  test("gini is in [0,1) and zero on a constant-length source") {
    import spark.implicits._
    val rows = run("q_x_gini").select(col("gini")).as[Double].collect()
    assert(rows.nonEmpty)
    rows.foreach(g => assert(g >= -1e-9 && g < 1.0, s"gini $g outside [0,1)"))
    // independent reference on a constant column: all-equal values
    // must give exactly 0 via the same rank formula
    val one = Seq.fill(50)(100).toDF("n_chars")
      .withColumn("source", lit("s")).withColumn("doc_id", monotonically_increasing_id())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    val g0 = one.withColumn("i", row_number().over(w))
      .groupBy(col("source"))
      .agg((lit(2.0) * sum(col("i") * col("n_chars")) / (count(lit(1)) * sum(col("n_chars")))
        - (count(lit(1)) + lit(1.0)) / count(lit(1))).as("g"))
      .select(col("g")).as[Double].head()
    assert(math.abs(g0) < 1e-12)
  }

  test("benford observed fractions sum to 1 and expected fractions are the benford law") {
    import spark.implicits._
    val rows = run("q_x_benford")
      .select(col("digit"), col("obs_frac"), col("exp_frac"))
      .as[(Int, Double, Double)].collect()
    assert(rows.map(_._1).sorted.sameElements(rows.map(_._1).distinct.sorted))
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4)
    rows.foreach { case (d, _, e) =>
      assert(d >= 1 && d <= 9)
      assert(math.abs(e - math.log10(1.0 + 1.0 / d)) < 1e-6) }
  }

  test("ks statistic is a probability and vanishes against an identical sample") {
    import spark.implicits._
    val rows = run("q_x_ks").select(col("ks")).as[Double].collect()
    assert(rows.nonEmpty)
    rows.foreach(k => assert(k >= 0.0 && k <= 1.0, s"ks $k outside [0,1]"))
    // two identical empirical distributions → sup|F1-F2| = 0, checked
    // through the exact-integer numerator route the query uses
    val xs = Seq(1, 2, 2, 3, 5, 8)
    val both = (xs.map(("a", _)) ++ xs.map(("b", _))).toDF("src", "v")
    val sl = both.groupBy(col("src"), col("v")).agg(count(lit(1)).as("c"))
    val lt = both.groupBy(col("v")).agg(count(lit(1)).as("t"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("v"))
    val m = sl.join(lt, "v")
      .withColumn("c1", sum(col("c")).over(w))
      .withColumn("ct", sum(col("t")).over(w))
      .withColumn("num", abs(col("c1") * lit(xs.size) - (col("ct") - col("c1")) * lit(xs.size)))
      .agg(max(col("num"))).as[Long].head()
    assert(m == 0L, s"identical samples produced nonzero KS numerator $m")
  }

  test("seasonality indices day-weight-average to 1 per event_type") {
    import spark.implicits._
    val bad = run("q_x_seasonality")
      .groupBy(col("event_type"))
      .agg((sum(col("season_idx") * col("n_days")) / sum(col("n_days"))).as("m"))
      .filter(abs(col("m") - 1.0) > 1e-4).as[(String, Double)].collect()
    assert(bad.isEmpty, s"season_idx not mean-1: ${bad.mkString(",")}")
  }

  test("memorize fractions are probabilities and planted near-dups score above the corpus") {
    import spark.implicits._
    val rows = run("q_x_memorize")
      .select(col("doc_id"), col("n_grams"), col("n_shared"), col("shared_frac"))
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, g, sh, f) =>
      assert(sh >= 0 && sh <= g, s"doc $id: n_shared $sh outside [0, $g]")
      assert(f >= 0.0 && f <= 1.0) }
    // docs that sit on a lossless near-dup edge share most 5-grams
    // with their twin — their mean shared_frac must exceed the corpus mean
    val dupIds = operators.DupGraph.edges(spark, sfDir, 0.8)
      .select(explode(array(col("a"), col("b"))).as("doc_id"))
      .distinct().as[Long].collect().toSet
    if (dupIds.nonEmpty) {
      val (inDup, rest) = rows.partition(r => dupIds.contains(r._1))
      val mDup = inDup.map(_._4).sum / inDup.length
      val mRest = rest.map(_._4).sum / rest.length
      assert(mDup > mRest, s"near-dup docs mean $mDup not above corpus mean $mRest")
    }
  }

  test("weighted median splits the weight mass per source") {
    import spark.implicits._
    val med = run("q_x_wmedian")
      .select(col("source"), col("wmedian"), col("total_weight"))
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val docs = Tables.table(spark, sfDir, "documents")
      .select(col("source"), col("n_chars"), (col("doc_id") % 7 + 1).as("wt"))
      .as[(String, Long, Long)].collect()
    med.foreach { case (src, (m, tot)) =>
      val ws = docs.filter(_._1 == src)
      assert(ws.map(_._3).sum == tot)
      val below = ws.filter(_._2 < m).map(_._3).sum
      val atOrBelow = ws.filter(_._2 <= m).map(_._3).sum
      assert(2 * below < tot || (2 * below == tot && ws.exists(_._2 == m)),
        s"$src: strict-below mass $below not below half of $tot")
      assert(2 * atOrBelow >= tot, s"$src: at-or-below mass $atOrBelow under half of $tot")
    }
  }

  test("ece bins partition the corpus and the by-construction-calibrated gaps stay small") {
    import spark.implicits._
    val rows = run("q_x_ece")
      .select(col("bin"), col("n"), col("avg_p"), col("avg_y"), col("gap"))
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(rows.map(_._1).forall(b => b >= 0 && b <= 9))
    val n = Tables.table(spark, sfDir, "documents").count()
    assert(rows.map(_._2).sum == n)
    val ece = rows.map(r => r._5 * r._2).sum / n
    // outcomes are drawn u2 < p, so true calibration error is 0; the
    // observed gap is binomial noise (~1/sqrt(bin n)) — bound loosely
    assert(ece < 0.25, s"weighted ECE $ece implausibly large for a calibrated draw")
    rows.foreach { case (b, _, p, _, _) =>
      assert(p >= b / 10.0 - 1e-6 && p <= (b + 1) / 10.0 + 1e-6,
        s"bin $b has avg_p $p outside its bin") }
  }

  test("ndcg is in [0,1] and agrees with mrr on which queries have any relevant hit") {
    import spark.implicits._
    val nd = run("q_x_ndcg")
      .select(col("query_id"), col("n_rel"), col("ndcg"))
      .as[(Long, Long, Option[Double])].collect()
    assert(nd.nonEmpty)
    nd.foreach { case (q, nr, n) =>
      assert(nr >= 0 && nr <= 10)
      if (nr == 0) assert(n.isEmpty, s"query $q: ndcg defined with no relevant hits")
      else {
        assert(n.nonEmpty)
        assert(n.get >= 0.0 && n.get <= 1.0 + 1e-9, s"query $q: ndcg ${n.get}")
      }
    }
    val mr = run("q_x_mrr")
      .select(col("query_id"), col("rr")).as[(Long, Double)].collect().toMap
    nd.foreach { case (q, nr, _) =>
      assert((mr(q) > 0.0) == (nr > 0),
        s"query $q: mrr ${mr(q)} disagrees with ndcg n_rel $nr") }
  }

  test("mrr reciprocal ranks are exactly 1/rank") {
    import spark.implicits._
    run("q_x_mrr")
      .select(col("first_rel_rank"), col("rr"))
      .as[(Option[Int], Double)].collect()
      .foreach {
        case (Some(r), rr) =>
          assert(r >= 1 && r <= 10)
          assert(math.abs(rr - 1.0 / r) < 1e-6)
        case (None, rr) => assert(rr == 0.0)
      }
  }

  test("robust_z: z vanishes at the median day and NULLs only on zero MAD") {
    import spark.implicits._
    val rows = run("q_x_robust_z")
      .select(col("event_type"), col("z")).as[(String, Option[Double])].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val zs = rs.flatMap(_._2)
      if (zs.nonEmpty) {
        // the median day's deviation is 0 → some z must be ~0 for odd
        // counts; in general the smallest |z| is tiny
        assert(zs.map(math.abs).min < 0.7,
          s"$t: smallest |z| ${zs.map(math.abs).min} — median not centered?")
        // MAD-scaled scores: at least half the days lie within |z| <= 0.6745·(max ad / mad)…
        // sharper: at least half within |z| ≤ 0.6745 is exactly the MAD definition
        val within = zs.count(z => math.abs(z) <= 0.6745 + 1e-6)
        assert(2 * within >= zs.length,
          s"$t: only $within/${zs.length} days within one MAD of the median")
      }
    }
  }

  test("theil decomposition is additive: T_total = Σ share·T_within + T_between") {
    import spark.implicits._
    val docs = Tables.table(spark, sfDir, "documents")
      .select(col("source"), col("n_chars")).filter(col("n_chars") > 0)
      .as[(String, Long)].collect()
    val n = docs.length.toDouble
    val mu = docs.map(_._2.toDouble).sum / n
    val tTotal = docs.map { case (_, x) => (x / mu) * math.log(x / mu) }.sum / n
    val rows = run("q_x_theil")
      .select(col("source"), col("n_docs"), col("mean_len"),
        col("t_within"), col("t_between_contrib"))
      .as[(String, Long, Double, Double, Double)].collect()
    val recomposed = rows.map { case (_, ng, mug, tw, _) =>
      (ng / n) * (mug / mu) * tw
    }.sum + rows.map(_._5).sum
    assert(math.abs(recomposed - tTotal) < 1e-3,
      s"decomposition $recomposed != direct $tTotal")
    // between-group Theil is a KL divergence → non-negative in total
    assert(rows.map(_._5).sum >= -1e-9)
    // within-group Theil of a positive variable is non-negative
    rows.foreach { case (s, _, _, tw, _) => assert(tw >= -1e-9, s"$s: T_within $tw < 0") }
  }

  test("blocking audit counts are mutually consistent") {
    import spark.implicits._
    val r = run("q_x_blocking")
      .select(col("n_docs"), col("n_blocks"), col("n_cand"), col("n_true"),
        col("n_coblocked"), col("reduction_ratio"), col("pair_completeness"))
      .as[(Long, Long, Long, Long, Long, Double, Option[Double])].head()
    val (nd, nb, nc, nt, ncb, rr, pc) = r
    assert(nb >= 1 && nb <= nd)
    assert(nc <= nd * (nd - 1) / 2)
    assert(ncb <= nt)
    assert(rr >= 0.0 && rr <= 1.0)
    pc.foreach(p => assert(p >= 0.0 && p <= 1.0))
    if (nt > 0) assert(pc.nonEmpty)
  }

  test("temporal split partitions the stream; embargo separates the sides in time") {
    import spark.implicits._
    val rows = run("q_x_temporal_split")
      .select(col("part"), col("n_rows"), col("n_spanning_users"))
      .as[(String, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq == rows.map(_._1).distinct.sorted.toSeq)
    val n = Tables.events(spark, sfDir).count()
    assert(rows.map(_._2).sum == n, "parts must partition every event")
    assert(rows.map(_._1).toSet.subsetOf(Set("train", "test", "embargo")))
    val m = rows.map(r => r._1 -> r._2).toMap
    assert(m.getOrElse("train", 0L) > m.getOrElse("embargo", 0L),
      "70% train must dwarf the 5% embargo")
    assert(rows.map(_._3).distinct.size == 1, "spanning-user count is global")
  }

  test("mutual information is non-negative and bounded by the source entropy") {
    import spark.implicits._
    val (mi, cells) = run("q_x_mi")
      .select(col("mi_nats"), col("n_cells")).as[(Double, Long)].head()
    assert(mi >= -1e-6, s"MI $mi negative")
    assert(cells >= 1)
    val hx = {
      val cnts = Tables.table(spark, sfDir, "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("c")).as[(String, Long)]
        .collect().map(_._2.toDouble)
      val n = cnts.sum
      -cnts.map(c => (c / n) * math.log(c / n)).sum
    }
    assert(mi <= hx + 1e-6, s"MI $mi exceeds H(source) $hx")
  }

  test("chi-square statistic and Cramér's V are in range") {
    import spark.implicits._
    val (chi2, dof, v) = run("q_x_chisq")
      .select(col("chi2"), col("dof"), col("cramers_v"))
      .as[(Double, Long, Double)].head()
    assert(chi2 >= 0.0)
    assert(dof >= 1, s"degenerate contingency table (dof $dof)")
    assert(v >= 0.0 && v <= 1.0 + 1e-9, s"Cramér's V $v outside [0,1]")
  }

  test("survival curve is a proper KM estimate: monotone, risk-set-consistent, mass-conserving") {
    import spark.implicits._
    val all = run("q_x_survival")
      .select(col("cohort"), col("dur_days"), col("n_at_risk"), col("n_churned"),
        col("n_censored"), col("survival"))
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(all.nonEmpty)
    val nUsers = Tables.events(spark, sfDir).select(col("user_id")).distinct().count()
    assert(all.map(r => r._4 + r._5).sum == nUsers, "every user ends exactly once")
    all.groupBy(_._1).foreach { case (cohort, rs) =>
      val rows = rs.sortBy(_._2)
      assert(rows.head._3 == rows.map(r => r._4 + r._5).sum,
        s"$cohort: whole cohort at risk at the first duration")
      rows.foreach { case (_, _, risk, d, c, s) =>
        assert(d + c <= risk); assert(s >= 0.0 && s <= 1.0) }
      rows.sliding(2).filter(_.length == 2).foreach { p =>
        assert(p(1)._6 <= p(0)._6 + 1e-9, s"$cohort: survival must be non-increasing")
        assert(p(1)._3 == p(0)._3 - p(0)._4 - p(0)._5,
          s"$cohort: risk set must shrink by exactly the endings") }
    }
  }

  test("ab test arms partition the users and z matches the rate difference sign") {
    import spark.implicits._
    val r = run("q_x_ab_test")
      .select(col("n_a"), col("n_b"), col("x_a"), col("x_b"),
        col("rate_a"), col("rate_b"), col("z"))
      .as[(Long, Long, Long, Long, Double, Double, Option[Double])].head()
    val nUsers = Tables.events(spark, sfDir).select(col("user_id")).distinct().count()
    assert(r._1 + r._2 == nUsers)
    assert(r._3 <= r._1 && r._4 <= r._2)
    assert(r._5 >= 0 && r._5 <= 1 && r._6 >= 0 && r._6 <= 1)
    r._7.foreach(z => assert(z.sign == (r._5 - r._6).sign || math.abs(z) < 1e-9))
  }

  test("zipf tail exponent is finite and greater than 1") {
    import spark.implicits._
    val (n, alpha) = run("q_x_zipf")
      .select(col("n_tail_terms"), col("alpha")).as[(Long, Double)].head()
    assert(n > 0, "fixture vocabulary must have a tail at xmin=5")
    assert(alpha > 1.0 && alpha < 100.0, s"implausible MLE alpha $alpha")
  }

  test("bloom membership: zero false negatives, bounded false-positive rate") {
    import spark.implicits._
    val rows = run("q_x_bloom")
      .select(col("is_member"), col("n"), col("n_maybe"))
      .as[(Boolean, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val (nm, mm) = rows(true)
    assert(mm == nm, s"false negatives: only $mm/$nm members flagged maybe")
    rows.get(false).foreach { case (n, maybe) =>
      // 8000 bits / ~members items → FPR well under 10%
      assert(maybe.toDouble / n < 0.10, s"implausible FPR ${maybe.toDouble / n}")
    }
  }

  test("concentration: top stratum is ~20% of users and its share dominates its headcount") {
    import spark.implicits._
    val rows = run("q_x_concentration")
      .select(col("event_type"), col("n_users"), col("n_top"), col("top_share"))
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, top, share) =>
      assert(top <= n && top >= 0)
      // exact-percentile threshold: strictly-above-P80 is at most 20%
      assert(5 * top <= n + 4, s"$t: $top of $n above the P80")
      assert(share >= 0.0 && share <= 1.0)
      // the top stratum must carry at least its headcount share of value
      if (top > 0) assert(share >= top.toDouble / n - 1e-6,
        s"$t: top users carry less value than uniform — not a valid P80 split")
    }
  }

  test("gaps: non-negative, median <= p90, and count matches n_events - n_users per type... globally") {
    import spark.implicits._
    val rows = run("q_x_gaps")
      .select(col("event_type"), col("n_gaps"), col("median_gap_s"), col("p90_gap_s"))
      .as[(String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, med, p90) =>
      assert(n > 0)
      assert(med >= 0.0 && p90 >= med, s"$t: median $med above p90 $p90")
    }
    // every event except each user's first produces exactly one gap
    val ev = Tables.events(spark, sfDir)
    val want = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(rows.map(_._2).sum == want,
      s"gap rows ${rows.map(_._2).sum} != events - users $want")
  }

  test("media_features checksum equals sha2 of the source text (stub is faithful)") {
    val docs = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), sha2(col("text"), 256).as("want"),
        length(col("text")).as("len"))
    val bad = run("q_x_media_features")
      .join(docs, "doc_id")
      .filter(col("checksum") =!= col("want") || col("n_bytes") =!= col("len"))
      .count()
    assert(bad == 0, s"$bad docs where the mapPartitions decode disagrees with SQL")
  }

  test("waveform stats respect their structural bounds and a hand-computed case") {
    import spark.implicits._
    val rows = run("q_x_waveform")
      .select(col("n_samples"), col("rms"), col("zero_crossings"), col("clip_frac"))
      .as[(Int, Double, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, rms, zc, cf) =>
      assert(rms >= 0.0 && rms <= 64.0, s"rms $rms outside byte range")
      assert(zc >= 0 && zc < n, s"$zc crossings for $n samples")
      assert(cf >= 0.0 && cf <= 1.0)
    }
    // independent check: "a@a" → samples (33, 0, 33) centered at 64
    // gives s = (33-64, 0, 33-64)?? no: bytes 'a'=97→33, '@'=64→0,
    // 'a'→33; crossings: 33*0 and 0*33 are not < 0 → 0 crossings
    val one = Multimodal_check("a@a")
    assert(one == ((3, math.sqrt((33L * 33 * 2).toDouble / 3), 0L, 0.0)),
      s"hand case got $one")
  }

  private def Multimodal_check(text: String): (Int, Double, Long, Double) = {
    import spark.implicits._
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val media = graft.multimodal.Multimodal.attachBinary(
      df.withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text"))))
    val r = graft.multimodal.Multimodal.waveformStats(spark, media).collect().head
    (r.n_samples, r.rms, r.zero_crossings, r.clip_frac)
  }

  test("frame_dedup covers every exact-duplicate pair at full frame overlap") {
    import spark.implicits._
    val docs = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), sha2(col("text"), 256).as("h"), length(col("text")).as("len"))
    val exactPairs = docs.as("a").join(docs.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        ceil(col("a.len") / 16.0).cast("long").as("n_frames_total"))
      .as[(Long, Long, Long)].collect()
    val got = run("q_x_frame_dedup")
      .select(col("doc_a"), col("doc_b"), col("n_shared_frames"))
      .as[(Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    exactPairs.foreach { case (a, b, total) =>
      val shared = got.getOrElse((a, b), 0L)
      // identical payloads share every DISTINCT frame; repeats inside
      // the doc collapse, so shared ≤ total but must be ≥ 3 and equal
      // for both docs
      assert(shared >= 3, s"exact dup ($a,$b) missing from frame dedup")
      assert(shared <= total)
    }
  }
}
