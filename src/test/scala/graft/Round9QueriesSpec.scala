package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-9 query wave beyond the oracle hash. */
class Round9QueriesSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q_join_skew equals the plain unsalted join aggregate") {
    val salted = run("q_join_skew").collect()
    val plain = Tables.table(spark, sfDir, "lineitem")
      .join(Tables.table(spark, sfDir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("s_nationkey"))
      .collect()
    assert(salted.length == plain.length)
    salted.zip(plain).foreach { case (a, b) =>
      assert(a.getInt(0) == b.getInt(0) && a.getLong(1) == b.getLong(1),
        s"salted row $a != plain $b")
    }
  }

  test("q_x_ewma_batch matches a driver-side reference fold") {
    // independent single-threaded reference over the same rows
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val expected = rows.groupBy(r => (r._1, r._2)).toSeq.map { case ((_, typ), rs) =>
      val sorted = rs.sortBy(r => (r._3, r._4))
      typ -> sorted.tail.foldLeft(sorted.head._5)((e, r) => 0.2 * r._5 + 0.8 * e)
    }.groupBy(_._1).map { case (typ, finals) =>
      typ -> (finals.size.toLong,
        BigDecimal(finals.map(_._2).sum / finals.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = run("q_x_ewma_batch").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (typ, (n, avg)) =>
      val (en, eavg) = expected(typ)
      assert(n == en, s"$typ n_series $n != $en")
      assert(math.abs(avg - eavg) < 1e-5, s"$typ avg_final_ewma $avg != $eavg")
    }
  }

  test("q_x_rolling_median frame never exceeds 10 rows and median is bounded") {
    // spot invariant: every rolling median lies within the global
    // min/max of value (order statistic cannot escape the range)
    val mm = Tables.events(spark, sfDir)
      .agg(min(col("value")), max(col("value"))).head()
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val bad = run("q_x_rolling_median")
      .filter(col("max_rolling_median") > hi + 1e-9 ||
        col("avg_rolling_median") < lo - 1e-9).count()
    assert(bad == 0)
  }

  test("q_x_quantile_norm deciles partition each source exactly") {
    val docs = Tables.table(spark, sfDir, "documents")
    val perSource = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs_src"))
    val viol = run("q_x_quantile_norm")
      .groupBy(col("source")).agg(sum(col("n_docs")).as("n_total"),
        countDistinct(col("decile")).as("n_dec"))
      .join(perSource, "source")
      .filter(col("n_total") =!= col("n_docs_src") || col("n_dec") > 10)
      .count()
    assert(viol == 0, "decile bucketing lost or duplicated docs")
  }

  test("q_x_quantile_norm norm is constant per decile across sources") {
    val viol = run("q_x_quantile_norm")
      .groupBy(col("decile")).agg(countDistinct(col("norm")).as("k"))
      .filter(col("k") =!= 1).count()
    assert(viol == 0, "normalized target differs across sources within a decile")
  }

  test("q_page_keyset returns exactly the page after the cursor, in order") {
    val rows = run("q_page_keyset").collect()
    assert(rows.length == 20)
    // fixture o_orderdate surfaces as TIMESTAMP_NTZ → LocalDateTime rows
    val cursor = java.time.LocalDateTime.of(1998, 6, 1, 0, 0)
    rows.foreach { r =>
      val (key, ts) = (r.getLong(0), r.getAs[java.time.LocalDateTime](1))
      assert(ts.isAfter(cursor) || (ts == cursor && key > 0L),
        s"row $r not past cursor")
    }
    val sorted = rows.map(r =>
      (r.getAs[java.time.LocalDateTime](1).toEpochSecond(java.time.ZoneOffset.UTC),
        r.getLong(0)))
    assert(sorted.sameElements(sorted.sorted), "page not in keyset order")
  }

  test("q_x_confusion marginals conserve the corpus") {
    val n = Tables.table(spark, sfDir, "embeddings").count()
    val out = run("q_x_confusion")
    val sums = out.agg(sum(col("n_actual")), sum(col("tp"))).head()
    assert(sums.getLong(0) == n, "actual-class counts do not sum to corpus")
    assert(sums.getLong(1) <= n)
    // F1 identity: f1 == 2tp/(n_pred+n_actual) within rounding
    val bad = out.filter(
      abs(col("f1") - lit(2.0) * col("tp") / (col("n_pred") + col("n_actual"))) > 1e-6)
      .count()
    assert(bad == 0)
  }

  test("q_x_kappa is consistent with q_x_confusion's diagonal") {
    val conf = run("q_x_confusion")
    val diag = conf.agg(sum(col("tp"))).head().getLong(0)
    val n = conf.agg(sum(col("n_actual"))).head().getLong(0)
    val row = run("q_x_kappa").head()
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - diag.toDouble / n) < 1e-6, "po mismatch")
    val (po, pe, kappa) = (row.getDouble(1), row.getDouble(2), row.getDouble(3))
    assert(math.abs(kappa - (po - pe) / (1.0 - pe)) < 1e-5, "kappa identity")
  }

  test("q_x_burstiness cells conserve events and fano is non-negative") {
    val nEvents = Tables.events(spark, sfDir).count()
    val out = run("q_x_burstiness").collect()
    out.foreach { r =>
      assert(r.getDouble(3) >= 0.0, s"negative fano: $r")
    }
    // Σ n_cells·mean_c over types == total events (cell counts sum back)
    val total = out.map(r => r.getLong(1) * r.getDouble(2)).sum
    assert(math.abs(total - nEvents) < nEvents * 1e-6 + 1.0,
      s"cell-count mass $total != events $nEvents")
  }
}
