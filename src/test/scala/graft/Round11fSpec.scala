package graft

import org.apache.spark.sql.functions._

/** Sharp invariants of the round-11 linkage/monitoring wave — exact
  * driver recomputes where closed-form, definitional bounds and
  * step-up-rule structure elsewhere.
  */
class Round11fSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("jaro: scores in [0.8, 1]; blocks agree; one pair matches the kernel") {
    val rows = run("q_x_jaro").collect()
    rows.foreach(r => assert(r.getDouble(2) >= 0.8 && r.getDouble(2) <= 1.0))
    if (rows.nonEmpty) {
      val pfx = Tables.table(spark, sfDir, "documents")
        .select(col("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 12))).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val h = rows.head
      val direct = graft.functions.JaroWinklerSim.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(pfx(h.getLong(0))),
        org.apache.spark.unsafe.types.UTF8String.fromString(pfx(h.getLong(1))))
      assert(math.abs(h.getDouble(2) - direct) < 1e-6)
      // blocking contract: every emitted pair shares its 2-word key
      rows.take(20).foreach { r =>
        val (a, b) = (pfx(r.getLong(0)), pfx(r.getLong(1)))
        assert(a.split(" ").take(2).sameElements(b.split(" ").take(2)))
      }
    }
  }

  test("cohort_ltv: per-user LTV is nondecreasing within each cohort") {
    val rows = run("q_x_cohort_ltv").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ltv = rs.sortBy(_.getLong(1)).map(_.getDouble(4))
      ltv.zip(ltv.drop(1)).foreach { case (a, b) =>
        assert(b >= a - 1e-9, "cumulative LTV must not decrease")
      }
    }
    // conservation: cohort sizes partition the user base
    val nUsers = Tables.table(spark, sfDir, "events")
      .select(col("user_id")).distinct().count()
    val sizes = rows.groupBy(_.getString(0))
      .map { case (_, rs) => rs.head.getLong(3) }.sum
    assert(sizes == nUsers)
  }

  test("rolling_corr: windows full, |r| <= 1, one day matches recompute") {
    val rows = run("q_x_rolling_corr").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
    val daily = Tables.table(spark, sfDir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L)).as("y"))
      .orderBy(col("day")).collect()
      .map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
    val win = daily.slice(0, 7)
    val n = 7.0
    val (sx, sy) = (win.map(_._1).sum, win.map(_._2).sum)
    val sxy = win.map(p => p._1 * p._2).sum
    val sxx = win.map(p => p._1 * p._1).sum
    val syy = win.map(p => p._2 * p._2).sum
    val r0 = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(math.abs(rows.head.getDouble(3) - r0) < 1e-5, s"day-7 recompute: $r0")
  }

  test("peak_detect: every peak strictly beats neighbors and the 1.5x rule") {
    val rows = run("q_x_peak_detect").collect()
    val daily = Tables.table(spark, sfDir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val (t, d, c) = (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2))
      val prev = daily.get((t, d.minusDays(1)))
      val nxt = daily.get((t, d.plusDays(1)))
      assert(prev.exists(_ < c) && nxt.exists(_ < c), s"peak $t $d beats neighbors")
      val nbr = (-3 to 3).flatMap(k => daily.get((t, d.plusDays(k.toLong))))
      assert(c * 2 * nbr.length > nbr.sum * 3, "prominence rule")
    }
  }

  test("bh_fdr: step-up structure — rejections are a prefix of the p-ranking") {
    val rows = run("q_x_bh_fdr").collect().sortBy(_.getLong(3))
    val m = rows.length.toLong
    // p nondecreasing in rank
    val ps = rows.map(_.getDouble(2))
    ps.zip(ps.drop(1)).foreach { case (a, b) => assert(b >= a - 1e-9) }
    // rejected = rank <= kmax where kmax = max rank with p <= rank*alpha/m
    val ks = rows.filter(r => r.getDouble(2) * m <= r.getLong(3) * 0.05 + 1e-12)
      .map(_.getLong(3))
    val kmax = if (ks.isEmpty) 0L else ks.max
    rows.foreach(r => assert(r.getBoolean(4) == (r.getLong(3) <= kmax)))
  }
}
