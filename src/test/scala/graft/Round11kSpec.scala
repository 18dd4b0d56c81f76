package graft

import org.apache.spark.sql.functions._

/** Sharp invariants of the kernel/divergence wave — metric axioms and
  * exact driver recomputes from per-source bucket histograms.
  */
class Round11kSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def buckets(): Map[String, Map[Long, Long]] =
    Tables.table(spark, sfDir, "documents")
      .select(col("source"), expr("n_chars div 20").as("b")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view
      .mapValues(_.groupBy(_._2).view.mapValues(_.length.toLong).toMap).toMap

  test("mmd: nonnegative; one pair matches a driver kernel recompute") {
    val rows = run("q_x_mmd").collect()
    rows.foreach(r => assert(r.getDouble(2) >= -1e-9, "MMD^2 >= 0"))
    val bs = buckets()
    val h = rows.head
    val (ha, hb) = (bs(h.getString(0)), bs(h.getString(1)))
    def ksum(x: Map[Long, Long], y: Map[Long, Long]): Double =
      (for ((bi, wi) <- x; (bj, wj) <- y)
        yield wi * wj * math.exp(-((bi - bj) * (bi - bj)).toDouble / 50.0)).sum
    val (na, nb) = (ha.values.sum.toDouble, hb.values.sum.toDouble)
    val mmd2 = ksum(ha, ha) / (na * na) + ksum(hb, hb) / (nb * nb) -
      2.0 * ksum(ha, hb) / (na * nb)
    assert(math.abs(h.getDouble(2) - mmd2) < 1e-5, s"mmd recompute: $mmd2")
  }

  test("hellinger: bc in [0,1], h in [0,1]; one pair matches recompute") {
    val rows = run("q_x_hellinger").collect()
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0 + 1e-9)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0 + 1e-9)
    }
    val bs = buckets()
    val h = rows.head
    val (ha, hb) = (bs(h.getString(0)), bs(h.getString(1)))
    val (na, nb) = (ha.values.sum.toDouble, hb.values.sum.toDouble)
    val bc = ha.keySet.intersect(hb.keySet).toSeq
      .map(b => math.sqrt(ha(b).toDouble * hb(b))).sum / math.sqrt(na * nb)
    assert(math.abs(h.getDouble(2) - bc) < 1e-5, s"bc recompute: $bc")
    assert(math.abs(h.getDouble(3) - math.sqrt(math.max(0.0, 1 - bc))) < 1e-5)
  }

  test("renyi: finite for every ordered pair; self-free; matches recompute") {
    val rows = run("q_x_renyi").collect()
    val srcs = buckets().keySet
    assert(rows.length == srcs.size * (srcs.size - 1), "every ordered pair")
    rows.foreach(r => assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
    val bs = buckets()
    val allB = bs.values.flatMap(_.keySet).toSet
    val h = rows.head
    val (ha, hb) = (bs(h.getString(0)), bs(h.getString(1)))
    val (na, nb) = (ha.values.sum.toDouble, hb.values.sum.toDouble)
    val srat = allB.toSeq.map { b =>
      val pa = ha.getOrElse(b, 0L).toDouble / na
      val pbS = (hb.getOrElse(b, 0L) + 1.0) / (nb + allB.size)
      pa * pa / pbS
    }.sum
    assert(math.abs(h.getDouble(2) - math.log(srat)) < 1e-5,
      s"renyi recompute: ${math.log(srat)}")
  }
}
