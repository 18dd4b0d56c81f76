package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Drift
import graft.streaming.StreamingJobs

/** The streaming Page–Hinkley monitor must end in EXACTLY the batch
  * fold's state: stream the events fixture in three DAY-ALIGNED
  * micro-batches and compare the final per-type PhState against a
  * one-shot driver fold over the same day series — bit-equal doubles,
  * because both sides call the single Drift.phStep definition. Also
  * proves shuffle-width invariance (the per-batch day aggregate is
  * deterministic at any layout).
  */
class StreamingPageHinkleySpec extends SparkSuite {

  private def dayCounts(): Seq[(String, String, Long)] =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"), col("day").cast("string"), col("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq

  private def batchAnswer(): Map[String, Drift.PhState] =
    dayCounts().groupBy(_._1).map { case (t, rows) =>
      t -> rows.sortBy(_._2).foldLeft(Drift.phInit)((s, r) => Drift.phStep(s, r._3))
    }

  // stage three day-range slices with increasing mtimes (day-aligned
  // batch boundaries — the sink's documented contract)
  private def stageByDay(): String = {
    val ev = Tables.events(spark, sfDir).withColumn("d", to_date(col("ts")))
    val days = dayCounts().map(_._2).distinct.sorted
    val cuts = Seq(days(days.length / 3), days(2 * days.length / 3))
    val dir = Files.createTempDirectory("graft-ph").toString
    val slices = Seq(
      col("d") < cuts.head,
      col("d") >= cuts.head && col("d") < cuts(1),
      col("d") >= cuts(1))
    slices.zipWithIndex.foreach { case (cond, i) =>
      ev.filter(cond).drop("d").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/part$i")
      val f = Files.list(java.nio.file.Paths.get(s"$dir/part$i"))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = java.nio.file.Paths.get(s"$dir/b$i.parquet")
      Files.move(f, dst)
      dst.toFile.setLastModified(1700000000000L + i * 60000L)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dir/part$i"))
    }
    dir
  }

  private def runStream(dir: String): (Map[String, Drift.PhState], Int) = {
    val schema = Tables.events(spark, sfDir).schema
    var state = Map.empty[String, Drift.PhState]
    val batches = mutable.ListBuffer.empty[Long]
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(dir)
    val q = StreamingJobs.pageHinkleySink(stream)(
      _ => state,
      (id, st) => { state = st; batches += id })
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ph-ckpt").toString)
      .start()
    q.awaitTermination()
    (state, batches.size)
  }

  test("3 day-aligned micro-batches end in the one-shot batch fold state, bit-equal") {
    val (streamed, nBatches) = runStream(stageByDay())
    assert(nBatches == 3, s"expected 3 micro-batches, got $nBatches")
    val batch = batchAnswer()
    assert(streamed.keySet == batch.keySet)
    batch.foreach { case (t, b) =>
      assert(streamed(t) == b, s"$t: streamed ${streamed(t)} != batch $b")
    }
  }

  test("monitor state is shuffle-width invariant (widths 2 and 5)") {
    val dir = stageByDay()
    val narrow = withShuffleWidth(2)(runStream(dir))._1
    val wide = withShuffleWidth(5)(runStream(dir))._1
    assert(narrow == wide)
    assert(narrow == batchAnswer())
  }
}
