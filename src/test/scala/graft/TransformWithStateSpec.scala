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

  test("state TTL expires idle keys between micro-batches") {
    TransformWithStateJobs.withRocksDb(spark)
    // ProcessingTime time-mode keeps scheduling no-data micro-batches
    // (for TTL/timer progress) — AvailableNow would never terminate
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("ttl_sess").toString
      def stage(name: String, rows: Seq[(Long, Double)], modMs: Long): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("ttl_tmp").toString
        rows.toDF("user_id", "value").coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        val target = new java.io.File(dir, name)
        java.nio.file.Files.move(part.toPath, target.toPath)
        target.setLastModified(modMs)
      }
      stage("f1.parquet", Seq((1L, 1.0), (1L, 2.0)), 1000000L)
      stage("f2.parquet", Seq((1L, 4.0)), 2000000L)
      val stream = spark.readStream.schema("user_id BIGINT, value DOUBLE")
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val out = TransformWithStateJobs.runningAgg(spark, stream,
        ttl = Some(java.time.Duration.ofMillis(500)))
      val batches = scala.collection.mutable.ListBuffer.empty[Seq[(Long, Double)]]
      val q = out.toDF().writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          batches.synchronized {
            batches += b.collect().toSeq.map(r => (r.getLong(1), r.getDouble(2)))
          }
          // wall-clock gap so batch 1's state outlives its 500 ms TTL
          if (id == 0) Thread.sleep(2000)
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // batch 0 accumulates (n=2, total=3); batch 1 starts FRESH
      // because the 500 ms TTL expired during the 2 s gap
      assert(batches.head === Seq((2L, 3.0)), batches.toString)
      assert(batches(1) === Seq((1L, 4.0)), batches.toString)
    } finally {
      spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("MapState+ListState profile final snapshot == batch equivalent") {
    TransformWithStateJobs.withRocksDb(spark)
    try {
      val out = TransformWithStateJobs.profiles(
        spark, StreamingJobs.readEvents(spark, sfDir))
      val q = out.toDF().writeStream.format("memory").queryName("t_prof")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = operators.Upsert.dedupKeyed(
        spark.table("t_prof"), Seq("user_id"),
        Seq(length(col("type_counts")))) // final row has the fullest counts
        .select(col("user_id"), col("type_counts"), round(col("recent_avg"), 6).as("ravg"))
      val ev = Tables.events(spark, sfDir)
      val typeCounts = ev.groupBy(col("user_id"), col("event_type")).count()
        .groupBy(col("user_id"))
        .agg(array_join(array_sort(collect_list(
          concat(col("event_type"), lit("="), col("count")))), ",").as("type_counts"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts").desc, col("value").asc)
      val recent = ev.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .groupBy(col("user_id")).agg(round(avg(col("value")), 6).as("ravg"))
      val expected = typeCounts.join(recent, "user_id")
      assert(got.count() === expected.count())
      assert(got.except(expected).isEmpty, "profile diverged from batch")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("late cross-batch event extends the open session's START (not just its end)") {
    TransformWithStateJobs.withRocksDb(spark)
    try {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("late_sess").toString
      def ts(m: Int) = new java.sql.Timestamp(3600000L + m * 60000L)
      def stage(name: String, rows: Seq[(Long, java.sql.Timestamp, Double)], modMs: Long): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("late_tmp").toString
        rows.toDF("user_id", "ts", "value").coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        val target = new java.io.File(dir, name)
        java.nio.file.Files.move(part.toPath, target.toPath)
        target.setLastModified(modMs)
      }
      // batch 1: events at 10:00, 10:05 — batch 2: LATE 9:58 (admitted,
      // watermark 9:55) — batch 3: 11:00 pushes the watermark past the
      // merged session's gap horizon and gap-breaks it
      stage("f1.parquet", Seq((1L, ts(0), 1.0), (1L, ts(5), 2.0)), 1000000L)
      stage("f2.parquet", Seq((1L, ts(-2), 4.0)), 2000000L)
      stage("f3.parquet", Seq((1L, ts(60), 8.0)), 3000000L)
      val schema = "user_id BIGINT, ts TIMESTAMP, value DOUBLE"
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val out = TransformWithStateJobs.sessionize(spark, stream)
      val q = out.toDF().writeStream.format("memory").queryName("t_late")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table("t_late")
        .as[TransformWithStateJobs.Session].collect().toSet
      // ONE session [9:58 .. 10:05] with all 3 events — the late 9:58
      // extended the start; the 11:00 session stays open (unflushable)
      assert(got === Set(TransformWithStateJobs.Session(
        1L, ts(-2).getTime, ts(5).getTime, 3L, 7.0)), got.toString)
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("timer-flushed sessionization == batch session_window") {
    TransformWithStateJobs.withRocksDb(spark)
    try {
      val out = TransformWithStateJobs.sessionize(
        spark, StreamingJobs.readEvents(spark, sfDir))
      val q = out.toDF().writeStream.format("memory").queryName("t_sess")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val gapMs = 10 * 60 * 1000L
      val got = spark.table("t_sess")
        .select(col("user_id"), col("start_ms"), (col("end_ms") + gapMs).as("wend_ms"),
          col("n"), round(col("total"), 6).as("total"))
      val expected = Tables.events(spark, sfDir)
        .groupBy(col("user_id"), session_window(col("ts"), "10 minutes").as("w"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("total"))
        .select(col("user_id"),
          (unix_millis(col("w.start"))).as("start_ms"),
          (unix_millis(col("w.end"))).as("wend_ms"),
          col("n"), col("total"))
      // timers fire in the trailing no-data micro-batch for every
      // session whose (end + gap) the FINAL watermark passed; sessions
      // beyond it (those containing/following the globally latest
      // events) stay open — the stream cannot know it is over. Emitted
      // set must match exactly up to that horizon, with nothing bogus.
      val maxTs = Tables.events(spark, sfDir)
        .agg(max(unix_millis(col("ts")))).collect()(0).getLong(0)
      val watermarkMs = maxTs - gapMs
      assert(got.except(expected).isEmpty, "sessionization diverged from session_window")
      val missing = expected.except(got)
      assert(missing.filter(col("wend_ms") <= lit(watermarkMs)).isEmpty,
        "a session below the final watermark was not flushed")
      assert(got.count() >= expected.count() - 5,
        s"too many unflushed: got=${got.count()} expected=${expected.count()}")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
