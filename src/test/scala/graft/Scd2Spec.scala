package graft

import org.apache.spark.sql.functions._

/** Invariants of the q_scd2 history build beyond the DuckDB hash
  * match: the validity intervals must tile each key's timeline —
  * contiguous, non-overlapping, exactly one open (current) row.
  */
class Scd2Spec extends SparkSuite {
  import spark.implicits._

  private def scd2 = SparkEntry.queries("q_scd2")(spark, sfDir)

  test("exactly one current (open-ended) version per key") {
    val perKey = scd2.groupBy("user_id", "event_type")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_open"))
    assert(perKey.filter($"n_open" =!= 1).isEmpty)
  }

  test("intervals are contiguous and non-overlapping within each key") {
    val rows = scd2
      .select($"user_id", $"event_type", $"valid_from".cast("long"), $"valid_to".cast("long"))
      .as[(Long, String, Long, Option[Long])]
      .collect()
      .groupBy(r => (r._1, r._2))
    assert(rows.nonEmpty)
    rows.foreach { case (_, versions) =>
      val sorted = versions.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"gap/overlap: ${a._4} -> ${b._3}")
        case _ => // single version
      }
      assert(sorted.last._4.isEmpty, "last version must be open-ended")
      assert(sorted.init.forall(_._4.nonEmpty), "only the last version may be open")
    }
  }
}
