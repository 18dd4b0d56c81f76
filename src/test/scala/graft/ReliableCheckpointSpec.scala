package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Checkpoints, Components, PageRank}

/** The 100 TB mode of the iterative operators: with
  * `spark.graft.reliableCheckpoint=true` and a checkpoint dir set,
  * every per-round lineage cut goes through reliable checkpointing
  * (survives executor loss) instead of executor-local blocks — and
  * the results are identical to the default mode.
  */
class ReliableCheckpointSpec extends SparkSuite {
  import spark.implicits._

  private def graph = {
    val nodes = (0L to 9L).toDF("id")
    // two components: a path 0-1-2-3 and a triangle 5-6-7; 4,8,9 isolated
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (7L, 5L))
      .toDF("a", "b")
    (nodes, edges)
  }

  test("components and pagerank identical under reliable checkpointing") {
    val (nodes, edges) = graph
    val ccDefault = Components.connectedComponents(spark, nodes, edges)
      .orderBy("id").collect().toSeq
    val prDefault = PageRank.pageRank(spark, nodes, edges, iters = 5)
      .select(col("id"), round(col("rank"), 9).as("r"))
      .orderBy("id").collect().toSeq

    val ckptDir = Files.createTempDirectory("graft-reliable-ckpt").toString
    spark.sparkContext.setCheckpointDir(ckptDir)
    spark.conf.set(Checkpoints.ConfKey, "true")
    try {
      val ccReliable = Components.connectedComponents(spark, nodes, edges)
        .orderBy("id").collect().toSeq
      val prReliable = PageRank.pageRank(spark, nodes, edges, iters = 5)
        .select(col("id"), round(col("rank"), 9).as("r"))
        .orderBy("id").collect().toSeq
      assert(ccReliable === ccDefault)
      assert(prReliable === prDefault)
      // the reliable path actually wrote checkpoint data
      val wrote = Files.walk(java.nio.file.Paths.get(ckptDir))
        .filter(Files.isRegularFile(_)).count()
      assert(wrote > 0, "no reliable checkpoint files written — mode not taken")
    } finally {
      spark.conf.set(Checkpoints.ConfKey, "false")
    }
  }
}
