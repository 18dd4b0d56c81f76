package graft

import org.apache.spark.sql.functions._

/** Re-aggregatable HLL sketch semantics (q_x_hll_union): the partial-
  * sketch union must agree with sketching the whole stream directly
  * (the property that makes per-day partials storable), and estimates
  * must track exact distinct counts within the lgK=12 error envelope.
  */
class HllUnionSpec extends SparkSuite {

  test("union of daily partials == direct sketch; estimate tracks exact") {
    val ev = Tables.table(spark, sfDir, "events")
      .withColumn("day", to_date(col("ts")))
    val viaUnion = ev.groupBy(col("event_type"), col("day"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("est_u"))
    val direct = ev.groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("est_d"),
        countDistinct(col("user_id")).as("exact"))
    val rows = viaUnion.join(direct, Seq("event_type")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (estU, estD, exact) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // HLL registers are order-independent maxima: a union of
      // partials sees the same register state as the direct sketch
      assert(estU == estD, s"${r.getString(0)}: union $estU != direct $estD")
      // lgK=12 => rsd ~1.6%; 3 sigma envelope
      assert(math.abs(estU - exact) <= math.max(1L, (exact * 0.05).toLong),
        s"${r.getString(0)}: est $estU vs exact $exact")
    }
  }

  test("declared query emits one row per event type") {
    val out = SparkEntry.queries("q_x_hll_union")(spark, sfDir)
    val types = Tables.table(spark, sfDir, "events")
      .select(col("event_type")).distinct().count()
    assert(out.count() == types)
    assert(out.filter(col("est_users") <= 0).count() == 0)
  }
}
