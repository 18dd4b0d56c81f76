package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IncrementalAgg

/** Incremental rollup maintenance: folding any split of the input
  * must be bit-identical to a full recompute (exact DECIMAL sums make
  * the fold associative — the no-drift contract). */
class IncrementalAggSpec extends SparkSuite {

  private val keys = Seq("day", "event_type")

  private def events: DataFrame =
    Tables.table(spark, sfDir, "events").withColumn("day", to_date(col("ts")))

  private def canon(df: DataFrame): Seq[String] =
    df.orderBy(keys.map(col): _*)
      .collect().map(_.toString).toSeq

  private def assertFoldEqualsFull(isDelta: org.apache.spark.sql.Column): Unit = {
    val ev = events
    val full = IncrementalAgg.rollup(ev, keys, "value")
    val folded = IncrementalAgg.merge(
      IncrementalAgg.rollup(ev.filter(!isDelta), keys, "value"),
      IncrementalAgg.rollup(ev.filter(isDelta), keys, "value"), keys)
    assert(canon(folded) == canon(full))
  }

  test("temporal split + late stragglers == full recompute") {
    assertFoldEqualsFull(
      col("ts") >= lit("2024-01-21 12:00:00").cast("timestamp") ||
        col("event_id") % 97 === 0)
  }

  test("interleaved split (all keys overlap) == full recompute") {
    assertFoldEqualsFull(col("event_id") % 2 === 0)
  }

  test("empty delta and empty state both pass keys through unchanged") {
    assertFoldEqualsFull(lit(false)) // empty delta
    assertFoldEqualsFull(lit(true))  // empty state
  }

  test("three-way fold in any order == full recompute") {
    val ev = events
    val parts = (0 until 3).map(i =>
      IncrementalAgg.rollup(ev.filter(col("event_id") % 3 === i), keys, "value"))
    val full = IncrementalAgg.rollup(ev, keys, "value")
    val fwd = IncrementalAgg.merge(
      IncrementalAgg.merge(parts(0), parts(1), keys), parts(2), keys)
    val rev = IncrementalAgg.merge(
      IncrementalAgg.merge(parts(2), parts(0), keys), parts(1), keys)
    assert(canon(fwd) == canon(full))
    assert(canon(rev) == canon(full))
  }
}
