package graft

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Dedup
import graft.streaming.StreamingJobs

/** The growing-corpus streaming dedup sink must converge to exactly
  * the batch answer: stream the documents fixture in THREE ordered
  * micro-batches with the corpus growing between them, and the
  * accepted set equals one-shot exactByHash over the whole fixture
  * (same contents kept, same smallest-id winners — the batch splits
  * are ascending in doc_id so first-arrival == min id).
  */
class StreamingGrowingDedupSpec extends SparkSuite {
  import spark.implicits._

  // the fixture has no EXACT dups, so plant cross-batch ones: copies
  // of the first 20 docs re-id'd into the LAST batch — the growing
  // state must reject them, and the batch answer keeps the original
  // (smaller) ids, so stream == batch stays exact
  private def plantedDocs() = {
    val fixture = Tables.table(spark, sfDir, "documents")
    fixture.unionByName(
      fixture.filter(col("doc_id") < 20)
        .withColumn("doc_id", col("doc_id") + 10000L))
  }

  // stage three ascending doc_id slices as separate files with
  // strictly increasing mtimes so the file source orders them
  private def stageSlices(docs: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("graft-grow-dedup").toString
    val bounds = Seq((0L, 170L), (170L, 340L), (340L, Long.MaxValue))
    bounds.zipWithIndex.foreach { case ((lo, hi), i) =>
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/part$i")
      val f = Files.list(Paths.get(s"$dir/part$i"))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = Paths.get(s"$dir/b$i.parquet")
      Files.move(f, dst)
      dst.toFile.setLastModified(1700000000000L + i * 60000L)
    }
    bounds.indices.foreach(i =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dir/part$i")))
    dir
  }

  // run the 3-batch growing-dedup stream end to end; returns the
  // accepted (doc_id, hash) rows in arrival order plus batch sizes
  private def runStream(docs: org.apache.spark.sql.DataFrame, dir: String)
      : (Seq[(Long, String)], Seq[Int]) = {
    val accepted = mutable.ListBuffer.empty[(Long, String)]
    val batchSizes = mutable.ListBuffer.empty[Int]
    def loadHashes(id: Long) =
      if (accepted.isEmpty) Seq.empty[String].toDF("ch")
      else accepted.map(_._2).toSeq.toDF("ch")

    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .option("latestFirst", "false")
      .parquet(dir)
    val q = StreamingJobs.growingDedupSink(stream, "text", "doc_id")(
      loadHashes,
      (novel, id) => {
        val rows = novel.select(col("doc_id"), col("h")).collect()
          .map(r => (r.getLong(0), r.getString(1)))
        accepted.synchronized { accepted ++= rows; batchSizes += rows.length }
      })
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-grow-ckpt").toString)
      .start()
    q.awaitTermination()
    (accepted.toSeq, batchSizes.toSeq)
  }

  test("streamed growing dedup == one-shot batch exactByHash") {
    val docs = plantedDocs()
    val (acceptedSeq, batchSizes) = runStream(docs, stageSlices(docs))
    val accepted = acceptedSeq

    assert(batchSizes.size == 3, s"expected 3 micro-batches, got $batchSizes")
    val batchAnswer = Dedup.exactByHash(docs, "text", "doc_id")
      .select(col("doc_id"), col("h")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(accepted.toSet == batchAnswer,
      s"stream kept ${accepted.size}, batch kept ${batchAnswer.size}")
    // the planted copies arrived in a LATER batch and were pruned by
    // state grown from earlier batches — the cross-batch property
    assert(accepted.size.toLong == docs.count() - 20,
      s"expected exactly the 20 planted dups pruned, kept ${accepted.size}")
    assert(!accepted.exists(_._1 >= 10000L), "a planted copy was accepted")
  }

  test("growing dedup is shuffle-width invariant: widths 2 and 5 accept identical sets") {
    // partitioning invariance (r12 verdict item 7): exact hash dedup is
    // fully deterministic — smallest id wins inside a batch, first
    // arrival wins across batches — so the accepted set must be
    // BIT-identical at any task layout, and per-batch accept counts
    // must match too (the batch boundary, not the shuffle width, is
    // the only thing allowed to shape state growth).
    val docs = plantedDocs()
    def run(w: Int): (Seq[(Long, String)], Seq[Int]) = withShuffleWidth(w) {
      runStream(docs, stageSlices(docs))
    }
    val (narrow, narrowSizes) = run(2)
    val (wide, wideSizes) = run(5)
    assert(narrowSizes.size == 3 && wideSizes.size == 3,
      s"expected 3 micro-batches at both widths, got $narrowSizes / $wideSizes")
    assert(narrowSizes == wideSizes,
      s"per-batch accept counts differ across widths: $narrowSizes vs $wideSizes")
    assert(narrow.toSet == wide.toSet,
      s"accepted sets differ across widths: ${narrow.size} vs ${wide.size}")
    val batchAnswer = Dedup.exactByHash(docs, "text", "doc_id")
      .select(col("doc_id"), col("h")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(narrow.toSet == batchAnswer,
      "width-invariant accepted set still must equal the one-shot batch answer")
  }
}
