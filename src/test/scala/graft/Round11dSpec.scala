package graft

import org.apache.spark.sql.functions._

/** Sharp invariants of the round-11 corpus-operations wave — exact
  * driver recomputes for the closed-form audits, structural
  * invariants (conservation, bounds, determinism) for the
  * table-shaped outputs.
  */
class Round11dSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def docs() =
    Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  private def userCounts(): Map[Long, Long] =
    Tables.table(spark, sfDir, "events")
      .groupBy(col("user_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("boilerplate: shares in [0,1]; one source matches a driver recompute") {
    val rows = run("q_x_boilerplate").collect()
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "n_shared <= n_grams")
      val share = r.getDouble(5)
      assert(share >= 0.0 && share <= 1.0)
    }
    // independent recompute for the first source
    val src = rows.head.getString(0)
    val perDoc = docs().filter(_._3 == src).map { case (_, t, _, _) =>
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val gramDocs = perDoc.flatten.groupBy(identity).view.mapValues(_.length)
    val nGrams = gramDocs.size.toLong
    val nShared = gramDocs.count(_._2 >= 2).toLong
    assert(rows.head.getLong(2) == nGrams, "n_grams recompute")
    assert(rows.head.getLong(3) == nShared, "n_shared recompute")
  }

  test("t_closeness: tvd in [0,1]; classes partition; one class matches recompute") {
    val rows = run("q_x_t_closeness").collect()
    val all = docs()
    assert(rows.map(_.getLong(2)).sum == all.length.toLong)
    rows.foreach { r =>
      val t = r.getDouble(3)
      assert(t >= 0.0 && t <= 1.0)
      assert(r.getBoolean(4) == (t > 0.3) || math.abs(t - 0.3) < 1e-5)
    }
    // recompute TVD for the first class
    val langOf = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val head = rows.head
    val (src, lb) = (head.getString(0), head.getLong(1))
    val cls = all.filter(d => d._3 == src && d._4 / 100 == lb)
    val glob = all.groupBy(d => langOf(d._1)).view.mapValues(_.length.toDouble)
    val cc = cls.groupBy(d => langOf(d._1)).view.mapValues(_.length.toDouble)
    val tvd = glob.keys.map { l =>
      math.abs(cc.getOrElse(l, 0.0) / cls.length - glob(l) / all.length)
    }.sum / 2.0
    assert(math.abs(head.getDouble(3) - tvd) < 1e-5, s"tvd recompute: $tvd")
  }

  test("curriculum: 100 rows, phases in 1..5 nondecreasing, md5 order inside phase") {
    val rows = run("q_x_curriculum").collect()
    assert(rows.length == 100)
    val phases = rows.map(_.getLong(0))
    assert(phases.forall(p => p >= 1 && p <= 5))
    assert(phases.sameElements(phases.sorted), "phase-major order")
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val hs = rs.map(_.getString(3))
      assert(hs.sameElements(hs.sorted), "hash order inside phase")
    }
    // deterministic: a second run returns the identical schedule
    val again = run("q_x_curriculum").collect()
    assert(rows.map(_.getLong(1)).sameElements(again.map(_.getLong(1))))
  }

  test("shard_assign: shards partition the corpus; balance factor >= 1") {
    val rows = run("q_x_shard_assign").collect()
    val n = docs().length.toLong
    assert(rows.map(_.getLong(1)).sum == n)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < 64)
      assert(r.getDouble(3) >= 1.0 - 1e-9)
    }
    val mx = rows.map(_.getLong(1)).max
    assert(math.abs(rows.head.getDouble(3) - mx * 64.0 / n) < 1e-5)
  }

  test("key_skew matches an exact driver recompute") {
    val row = run("q_x_key_skew").collect().head
    val cnts = userCounts()
    val d = cnts.size.toLong
    assert(row.getLong(0) == cnts.values.sum)
    assert(row.getLong(1) == d)
    assert(row.getLong(2) == cnts.values.max)
    // p99: smallest size with 100*cum >= 99*D over the ordered histogram
    val sizes = cnts.values.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    var cum = 0L
    val p99 = sizes.collectFirst {
      case (sz, k) if { cum += k; cum * 100 >= 99 * d } => sz
    }.get
    assert(row.getLong(3) == p99, s"p99 recompute: $p99")
  }

  test("join_card: exact pairs match; skew multiplier >= 1 (Cauchy-Schwarz)") {
    val row = run("q_x_join_card").collect().head
    val cnts = userCounts()
    assert(row.getLong(2) == cnts.values.map(c => c * c).sum)
    assert(row.getDouble(4) >= 1.0 - 1e-9, "sum c^2 >= N^2/D")
  }

  test("dedup_impact: conservation and exact per-source recompute") {
    val rows = run("q_x_dedup_impact").collect()
    val all = docs()
    assert(rows.map(_.getLong(1)).sum == all.length.toLong)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_unique <= n_docs")
      assert(r.getLong(6) == r.getLong(3) - r.getLong(4), "chars_saved = before - after")
    }
    val src = rows.head.getString(0)
    val grp = all.filter(_._3 == src).groupBy(_._2)
    assert(rows.head.getLong(2) == grp.size.toLong)
    assert(rows.head.getLong(4) == grp.values.map(_.head._4).sum)
  }
}
