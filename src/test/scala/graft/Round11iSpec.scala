package graft

import org.apache.spark.sql.functions._

/** Sharp invariants of the novelty/provenance wave — exact driver
  * recomputes from an independent in-memory first-occurrence map.
  */
class Round11iSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  // independent trigram postings + first-occurrence map
  private lazy val docs: Array[(Long, String, Set[String])] =
    Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map { r =>
        val grams = r.getString(2).split(" ").sliding(3)
          .filter(_.length == 3).map(_.mkString(" ")).toSet
        (r.getLong(0), r.getString(1), grams)
      }
  private lazy val firstDoc: Map[String, Long] =
    docs.flatMap { case (id, _, gs) => gs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap

  test("ngram_novelty matches an exact driver recompute; first doc is fully novel") {
    val rows = run("q_x_ngram_novelty").collect()
    val byId = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    docs.filter(_._3.nonEmpty).foreach { case (id, _, gs) =>
      val (ng, nn) = byId(id)
      assert(ng == gs.size.toLong, s"doc $id n_grams")
      assert(nn == gs.count(firstDoc(_) == id).toLong, s"doc $id n_novel")
    }
    val minId = docs.filter(_._3.nonEmpty).map(_._1).min
    val (ng0, nn0) = byId(minId)
    assert(ng0 == nn0, "the earliest doc owns every one of its grams")
  }

  test("source_novelty: owned <= total; global owned mass = distinct gram count") {
    val rows = run("q_x_source_novelty").collect()
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    // every gram is owned by exactly one source
    assert(rows.map(_.getLong(2)).sum == firstDoc.size.toLong)
    // recompute one source exactly
    val src = rows.head.getString(0)
    val srcDocs = docs.filter(_._2 == src)
    val srcGrams = srcDocs.flatMap(_._3).toSet
    val owned = srcGrams.count { g =>
      docs.find(_._1 == firstDoc(g)).get._2 == src
    }
    assert(rows.head.getLong(1) == srcGrams.size.toLong)
    assert(rows.head.getLong(2) == owned.toLong)
  }

  test("vocab_growth: new-gram masses partition the vocabulary; cum is a cumsum") {
    val rows = run("q_x_vocab_growth").collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(1)).sum == firstDoc.size.toLong)
    var cum = 0L
    rows.foreach { r =>
      cum += r.getLong(1)
      assert(r.getLong(2) == cum, "cum_grams is the running total")
    }
  }
}
