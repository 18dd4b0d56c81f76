package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{StreamingJobs, TransformWithStateJobs}

/** The EWMA stateful processor must be batching-invariant (the fold
  * resumes from managed state) and match an independent driver-side
  * fold of the same (ts, event_id)-ordered sequence.
  */
class EwmaSpec extends SparkSuite {

  private val alpha = 0.2

  /** driver-side reference: sequential fold per event_type */
  private def reference(): Map[String, (Long, Double)] = {
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("ts"), col("value"))
      .collect()
      .map { r =>
        val ts = r.getTimestamp(2)
        // floorDiv like the processor: plain / truncates toward zero
        // for pre-epoch millis, misordering against getNanos ∈ [0,1e9)
        (r.getString(0), r.getLong(1), (Math.floorDiv(ts.getTime, 1000L), ts.getNanos), r.getDouble(3))
      }
      .sortBy(r => (r._3, r._2))
    rows.groupBy(_._1).map { case (k, rs) =>
      var n = 0L; var y = 0.0
      rs.foreach { r =>
        y = if (n == 0) r._4 else alpha * r._4 + (1.0 - alpha) * y
        n += 1
      }
      k -> (n, y)
    }
  }

  private def finalStates(streamName: String): Map[String, (Long, Double)] = {
    val finals = operators.Upsert.dedupKeyed(
      spark.table(streamName), Seq("event_type"), Seq(col("n")))
    finals.collect().map(r =>
      r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Double]("ewma"))).toMap
  }

  private def close(a: Map[String, (Long, Double)], b: Map[String, (Long, Double)]): Unit = {
    assert(a.keySet == b.keySet)
    a.foreach { case (k, (n, y)) =>
      assert(b(k)._1 == n, s"$k: n ${b(k)._1} != $n")
      assert(math.abs(b(k)._2 - y) < 1e-9, s"$k: ewma ${b(k)._2} != $y")
    }
  }

  test("single-batch streamed EWMA == driver reference fold") {
    TransformWithStateJobs.withRocksDb(spark)
    try {
      val out = TransformWithStateJobs.ewma(
        spark, StreamingJobs.readEvents(spark, sfDir), alpha)
      val q = out.toDF().writeStream.format("memory").queryName("t_ewma1")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      close(reference(), finalStates("t_ewma1"))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("3-batch streamed EWMA == single batch (state resumes the fold)") {
    TransformWithStateJobs.withRocksDb(spark)
    try {
      // split events into three ts-ordered slices so cross-batch order
      // equals event order per key
      val ev = Tables.events(spark, sfDir)
      val cuts = ev.stat.approxQuantile("event_id", Array(0.33, 0.66), 0.0)
      val dir = Files.createTempDirectory("graft-ewma").toString
      val slices = Seq(
        ev.filter(col("event_id") < cuts(0)),
        ev.filter(col("event_id") >= cuts(0) && col("event_id") < cuts(1)),
        ev.filter(col("event_id") >= cuts(1)))
      // events fixture is ts-ordered by event_id (spec-checked below),
      // so event_id slicing preserves per-key time order across batches
      val ordered = ev.select(col("event_id"), col("ts")).orderBy("event_id").collect()
      assert(ordered.sliding(2).forall(p =>
        !p(1).getTimestamp(1).before(p(0).getTimestamp(1))),
        "fixture events must be ts-ordered by event_id for this slicing")
      slices.zipWithIndex.foreach { case (df, i) =>
        df.coalesce(1).write.mode("overwrite").parquet(s"$dir/part$i")
        val f = Files.list(Paths.get(s"$dir/part$i"))
          .filter(_.toString.endsWith(".parquet")).findFirst().get()
        val dst = Paths.get(s"$dir/b$i.parquet")
        Files.move(f, dst)
        dst.toFile.setLastModified(1700000000000L + i * 60000L)
      }
      val stream = spark.readStream.schema(
          Tables.events(spark, sfDir).schema)
        .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
        .parquet(dir)
      val q = TransformWithStateJobs.ewma(spark, stream, alpha)
        .toDF().writeStream.format("memory").queryName("t_ewma3")
        .outputMode("update").trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          Files.createTempDirectory("graft-ewma-ckpt").toString)
        .start()
      q.awaitTermination()
      close(reference(), finalStates("t_ewma3"))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("kill + restart from checkpoint resumes the fold (RocksDB state restore)") {
    TransformWithStateJobs.withRocksDb(spark)
    try {
      val ev = Tables.events(spark, sfDir)
      val cut = ev.stat.approxQuantile("event_id", Array(0.66), 0.0)(0)
      val dir = Files.createTempDirectory("graft-ewma-restart").toString
      val ckpt = Files.createTempDirectory("graft-ewma-restart-ckpt").toString
      def writeSlice(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
        val tmp = s"$dir/_stage_$name"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val f = Files.list(Paths.get(tmp))
          .filter(_.toString.endsWith(".parquet")).findFirst().get()
        Files.move(f, Paths.get(s"$dir/$name.parquet"))
      }
      // memory sink does not support checkpoint recovery; foreachBatch
      // does, and collects each batch's updates into a driver buffer
      val updates = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double)]
      def runOnce(): Unit = {
        val stream = spark.readStream.schema(ev.schema).parquet(dir)
        val sink: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
          (df, _) => {
            val rows = df.collect().map(r =>
              (r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Double]("ewma")))
            updates.synchronized { updates ++= rows }
          }
        val q = TransformWithStateJobs.ewma(spark, stream, alpha)
          .toDF().writeStream.foreachBatch(sink)
          .outputMode("update").trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .start()
        q.awaitTermination()
      }
      // run 1 folds the first two thirds, then the query STOPS (the
      // kill); run 2 is a brand-new query object on the same
      // checkpoint — state must come back from the RocksDB snapshot,
      // not from reprocessing (the source file of run 1 is still
      // present, so a restart that re-read it would double-fold and
      // fail the n/ewma equality below).
      writeSlice(ev.filter(col("event_id") < cut), "b0")
      runOnce()
      writeSlice(ev.filter(col("event_id") >= cut), "b1")
      runOnce()
      // per-key n is monotone in the fold — the row with max n is each
      // key's LAST update across both runs (keys untouched by slice 2
      // keep their run-1 state)
      val merged = updates.groupBy(_._1).map { case (k, rs) =>
        val last = rs.maxBy(_._2)
        k -> (last._2, last._3)
      }
      close(reference(), merged)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
