package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only harness for the iterative-family per-round overhead study
  * (VERDICT r11 item 6): dbscan/lpa/pagerank/semantic_dedup/cascade
  * are the top of the board's cost and are suspected to be
  * iteration-OVERHEAD-bound at fixture scale. This measures, per
  * operator and per SF:
  *
  *  - the per-round MARGINAL cost — run the same operator at two round
  *    counts and take the slope, so the shared graph derivation and
  *    the fixed setup cancel out;
  *  - the driver-vs-executor split — PageRank/LPA loops are fully lazy
  *    (per-round lineage cuts, no actions), so the loop wall time IS
  *    the Catalyst planning + codegen + cut bookkeeping cost, and the
  *    final action's wall time is all execution;
  *  - the pure per-round FLOOR — the same slopes on a 512-node chain
  *    graph, where data cost is ~0 and only scheduler/planning/cut
  *    overhead remains.
  *
  * Components' rounds each end in a real convergence action, so its
  * per-round split comes from the graft.roundProbe instrumentation
  * inside the loop instead.
  *
  * Usage: runMain graft.IterProbe <sfDir>
  */
object IterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftSparkExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.props("graft.roundProbe") = "true"
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.enableCaching(spark, sfDir)
    graft.operators.DupGraph.enableCaching()
    graft.operators.CosGraph.enableCaching()

    def docs: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"))
    def emb: DataFrame = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"))

    // warm the shared derivations once so they cancel in every slope
    val e06 = graft.operators.DupGraph.edges(spark, sfDir, 0.6)
    val e08 = graft.operators.DupGraph.edges(spark, sfDir, 0.8)
    val cos04 = graft.operators.CosGraph.edges(spark, sfDir, threshold = 0.4)
    println(s"[iterprobe] edges06=${e06.count()} edges08=${e08.count()} " +
      s"cos04=${cos04.count()} (derivations warm)")

    def dropBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .filter(Rdds.isLocallyCheckpointed)
        .foreach(_.unpersist(blocking = false))

    /** Lazy-loop split: returns (loopBuildSec, actionSec) best-of-2. */
    def timedSplit(tag: String)(build: => DataFrame): (Double, Double) = {
      // cold pass absorbs JIT/codegen-cache effects
      build.count(); dropBlocks()
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val df = build
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        dropBlocks()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val best = runs.minBy(r => r._1 + r._2)
      println(f"[iterprobe] $tag%-28s build=${best._1}%.3f action=${best._2}%.3f")
      best
    }

    def slope(tag: String, lo: Int, hi: Int)(
        run: Int => DataFrame): Unit = {
      val (bLo, aLo) = timedSplit(s"$tag rounds=$lo")(run(lo))
      val (bHi, aHi) = timedSplit(s"$tag rounds=$hi")(run(hi))
      val n = (hi - lo).toDouble
      println(f"[iterprobe] $tag%-28s perRound: build=${(bHi - bLo) / n}%.4f " +
        f"exec=${(aHi - aLo) / n}%.4f total=${(bHi + aHi - bLo - aLo) / n}%.4f")
    }

    println("=== PageRank (documents, DupGraph 0.6) ===")
    slope("pagerank", 2, 12)(it =>
      graft.operators.PageRank.pageRank(spark, docs, e06, iters = it))

    println("=== LPA (documents, DupGraph 0.8) ===")
    slope("lpa", 2, 10)(it =>
      graft.operators.Lpa.communities(spark, docs, e08, rounds = it))

    println("=== Components (embeddings, CosGraph 0.4 = semantic_dedup) ===")
    timedSplit("cc cos04")(
      graft.operators.Components.connectedComponents(spark, emb, cos04))
    // jumps >= 2 probes removed (r12 ADVICE): each extra jump
    // self-joins the fold frame with no mid-round cut, so executed
    // work grows ~2^j per round — the probe then measures duplicated
    // execution, not the planning slope it exists to isolate (and it
    // ran for 10+ minutes on the 920-edge cos04 graph).

    println("=== Components (documents, DupGraph 0.6 = dup_clusters) ===")
    timedSplit("cc dup06")(
      graft.operators.Components.connectedComponents(spark, docs, e06))

    // ---- pure overhead floor: 512-node chain, data cost ~0 ----
    // (fresh frames per call: dropBlocks() between runs would orphan
    // any shared eager localCheckpoint of these fixtures)
    println("=== floor: 512-node chain graph ===")
    def chainNodes = spark.range(512).select(col("id"))
    def chainEdges = spark.range(511)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    slope("floor pagerank", 2, 12)(it =>
      graft.operators.PageRank.pageRank(spark, chainNodes, chainEdges, iters = it))
    slope("floor lpa", 2, 10)(it =>
      graft.operators.Lpa.communities(spark, chainNodes, chainEdges, rounds = it))
    timedSplit("floor cc chain")(
      graft.operators.Components.connectedComponents(spark, chainNodes, chainEdges))

    spark.stop()
  }
}
