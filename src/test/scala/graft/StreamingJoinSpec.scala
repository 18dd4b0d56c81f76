package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingJobs

/** Stream-static and stream-stream joins verified by batch
  * equivalence (single AvailableNow micro-batch: watermarks drop
  * nothing, so the streamed result must equal the batch join).
  */
class StreamingJoinSpec extends SparkSuite {

  private def drain(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  test("stream-static enrichment == batch broadcast join") {
    val dim = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct()
      .withColumn("tier", when(col("user_id") % 2 === 0, "gold").otherwise("basic"))
    val streamed = drain(
      StreamingJobs.enrichWithDim(
        StreamingJobs.readEvents(spark, sfDir).select(col("event_id"), col("user_id")),
        dim, "user_id"),
      "t_enrich")
    val batch = Tables.events(spark, sfDir).select(col("event_id"), col("user_id"))
      .join(dim, "user_id")
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("stream-stream purchase-click join == batch range join") {
    val streamed = drain(
      StreamingJobs.purchaseClickJoin(StreamingJobs.readEvents(spark, sfDir)),
      "t_ssjoin")
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("value").as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"))
    val batch = purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES") &&
        col("click_ts") <= col("purchase_ts"))
      .select(col("event_id"), col("user_id"), col("purchase_ts"),
        col("click_ts"), col("click_value"))
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
    assert(streamed.count() > 0)
  }
}
