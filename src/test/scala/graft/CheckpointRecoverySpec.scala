package graft

import java.nio.file.{Files, Paths}

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.streaming.Trigger

/** Exactly-once resume: a restarted streaming query with the same
  * checkpoint processes only data that arrived since the last run —
  * the property that makes the reference's replay-tolerant 5-minute
  * cadence (weather-etl.py:46,54) safe to operate.
  */
class CheckpointRecoverySpec extends SparkSuite {
  import spark.implicits._

  test("restart from checkpoint processes only new files, no reprocessing") {
    val dataDir = Files.createTempDirectory("graft-ckpt-data").toString
    val ckptDir = Files.createTempDirectory("graft-ckpt-meta").toString
    val seen = ListBuffer.empty[(Long, Seq[String])]

    def runOnce(): Unit = {
      val q = spark.readStream.textFile(dataDir)
        .writeStream
        .option("checkpointLocation", ckptDir)
        .outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[String], id: Long) =>
          seen.synchronized { seen += ((id, batch.collect().toSeq.sorted)) }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    Files.writeString(Paths.get(s"$dataDir/f1.txt"), "a\nb\nc")
    runOnce()
    val afterFirst = seen.flatMap(_._2).toSeq
    assert(afterFirst.sorted === Seq("a", "b", "c"))

    Files.writeString(Paths.get(s"$dataDir/f2.txt"), "d\ne")
    runOnce()
    val all = seen.flatMap(_._2).toSeq
    // exactly once: a,b,c NOT reprocessed on restart
    assert(all.sorted === Seq("a", "b", "c", "d", "e"))
    // and the second run used a new batch id
    assert(seen.map(_._1).distinct.size === seen.size)
  }
}
