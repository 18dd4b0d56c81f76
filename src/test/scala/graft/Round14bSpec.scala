package graft

import org.apache.spark.sql.functions._

/** Round-14 wave-2 queries vs independent driver recomputes: Ljung–Box
  * against a literal textbook ACF loop (centered products, not the
  * expanded-moment form the query uses) and von Neumann against a
  * direct successive-difference loop, plus the declared
  * observation-index-grain property (a calendar gap closes ranks:
  * lag 1 pairs observations, not days).
  */
class Round14bSpec extends SparkSuite {

  private def dailySeries(dir: String): Map[String, Array[Long]] =
    Tables.table(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("event_type"), col("day"))
      .collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toArray).toMap

  /** Textbook Ljung–Box: centered-product ACF, m lags. */
  private def lbRef(x: Array[Long], m: Int): Option[Double] = {
    val n = x.length
    if (n <= m) return None
    val mean = x.sum.toDouble / n
    val den = x.map(v => (v - mean) * (v - mean)).sum
    if (!(den > 0)) return None
    val q = (1 to m).map { k =>
      val rk = (k until n).map(t => (x(t) - mean) * (x(t - k) - mean)).sum / den
      rk * rk / (n - k)
    }.sum * n * (n + 2)
    Some(q)
  }

  /** Direct von Neumann ratio + declared-moment z. */
  private def vnRef(x: Array[Long]): Option[(Double, Double)] = {
    val n = x.length
    if (n < 3) return None
    val mean = x.sum.toDouble / n
    val den = x.map(v => (v - mean) * (v - mean)).sum
    if (!(den > 0)) return None
    val num = (1 until n).map(t => (x(t) - x(t - 1)).toDouble).map(d => d * d).sum
    val vn = num / den
    val z = (vn - 2) / math.sqrt(4.0 * (n - 2) / ((n - 1.0) * (n + 1)))
    Some((vn, z))
  }

  test("q_x_ljung_box matches a textbook centered-product recompute") {
    val got = SparkEntry.queries("q_x_ljung_box")(spark, sfDir).collect()
      .map(r => r.getString(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    val series = dailySeries(sfDir)
    assert(got.nonEmpty && got.keySet == series.keySet)
    series.foreach { case (t, x) =>
      (lbRef(x, 7), got(t)) match {
        case (Some(exp), Some(q)) => assert(math.abs(exp - q) < 1e-5, s"type $t")
        case (None, None)         => ()
        case other                => fail(s"type $t guard mismatch: $other")
      }
    }
  }

  test("q_x_von_neumann matches a direct successive-difference recompute") {
    val got = SparkEntry.queries("q_x_von_neumann")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap
    dailySeries(sfDir).foreach { case (t, x) =>
      (vnRef(x), got(t)) match {
        case (Some((vn, z)), (Some(gv), Some(gz))) =>
          assert(math.abs(vn - gv) < 1e-5 && math.abs(z - gz) < 1e-5, s"type $t")
        case (None, (None, None)) => ()
        case other                => fail(s"type $t guard mismatch: $other")
      }
    }
  }

  test("observation-index grain: a calendar gap closes ranks (declared)") {
    // Series over days 1,2,3,10,11 — lag-1 pairs (3,10) across the
    // 7-day gap. The declared-grain VN numerator includes (c[10]-c[3])²;
    // a day-grain lag would exclude it. Values chosen so the two
    // conventions disagree.
    val dir = java.nio.file.Files.createTempDirectory("r14b_gap").toString
    import spark.implicits._
    val rows = Seq(
      ("2024-01-01", 10L), ("2024-01-02", 12L), ("2024-01-03", 11L),
      ("2024-01-10", 40L), ("2024-01-11", 41L))
    rows.flatMap { case (day, c) =>
      (1L to c).map(i => (s"e$day-$i", java.sql.Timestamp.valueOf(s"$day 00:00:00"),
        1L, "gap_type", 0.0))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val x = rows.map(_._2).toArray
    val Some((vnExp, _)) = vnRef(x)
    val got = SparkEntry.queries("q_x_von_neumann")(spark, dir).collect()
    assert(got.length == 1 && math.abs(got(0).getDouble(2) - vnExp) < 1e-5)
    // and the cross-gap pair genuinely matters: dropping it changes vn
    val mean = x.sum.toDouble / x.length
    val den = x.map(v => (v - mean) * (v - mean)).sum
    val vnNoGapPair = (x.sliding(2).toSeq.filterNot(p => p(0) == 11L)
      .map(p => (p(1) - p(0)).toDouble).map(d => d * d).sum) / den
    assert(math.abs(vnExp - vnNoGapPair) > 1e-3)

    val Some(lbExp) = lbRef(x, 7).orElse(Some(-1.0)) // n=5 <= 7 → None → r1-only check
    assert(lbExp == -1.0)
    val lb = SparkEntry.queries("q_x_ljung_box")(spark, dir).collect()
    assert(lb.length == 1 && lb(0).isNullAt(3)) // q_lb NULL-guarded, row kept
    // r1 still emitted at the declared grain
    val r1Exp = {
      val n = x.length
      (1 until n).map(t => (x(t) - mean) * (x(t - 1) - mean)).sum / den
    }
    assert(math.abs(lb(0).getDouble(2) - r1Exp) < 1e-5)
  }
}
