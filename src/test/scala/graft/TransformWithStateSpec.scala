package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{StreamingJobs, TransformWithStateJobs}

/** transformWithState running aggregate must agree with the batch
  * groupBy over the same fixture.
  */
class TransformWithStateSpec extends SparkSuite {

  test("transformWithState running agg final state == batch groupBy") {
    TransformWithStateJobs.withRocksDb(spark)
    try {
      val out = TransformWithStateJobs.runningAgg(
        spark, StreamingJobs.readEvents(spark, sfDir))
      val q = out.toDF().writeStream.format("memory").queryName("t_tws")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // update mode: emits per batch per key — keep the final row
      val got = operators.Upsert.dedupKeyed(
        spark.table("t_tws"), Seq("user_id"), Seq(col("n")))
        .select(col("user_id"), col("n"), round(col("total"), 6).as("total"))
      val expected = Tables.events(spark, sfDir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("total"))
      assert(got.count() === expected.count())
      assert(got.except(expected).isEmpty, "state aggregate diverged from batch")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
