package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Ivf, IvfPq, Pq, Similarity}

/** Dev-only ANN recall report (VERDICT r4/r5 task: surface recall as a
  * per-round artifact, not just a spec threshold). Computes recall@10
  * of the two approximate declared paths — q_x_ann_lsh and q_x_ann_ivf,
  * with EXACTLY their declared parameters — against the exact
  * brute-force top-k on the same query set, and prints one JSON line.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt "runMain graft.Recall" → paste into dev/recall.txt
  */
object Recall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftSparkExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.table(spark, sfDir, "embeddings")
    // same query subset as the declared queries (Extensions.scala)
    val qs = emb.filter(col("vec_id") % 25 === 0)
    val exact = Similarity.bruteForceKnn(qs, emb, k = 10)
      .select(col("query_id"), col("cand_id")).cache()
    val total = exact.count().toDouble

    def recallOf(approx: org.apache.spark.sql.DataFrame): Double =
      approx.select(col("query_id"), col("cand_id"))
        .intersect(exact).count() / total

    val lsh = recallOf(Similarity.lshKnn(spark, qs, emb, k = 10))
    val ivf = recallOf(Ivf.ivfKnn(spark, qs, emb, k = 10, nProbe = 8, iters = 1))
    // the documented recall knobs, exercised with numbers. LSH: more
    // hash tables (union of buckets, recall 1-(1-p^planes)^tables;
    // candidate volume linear in tables). IVF: more centroids at fixed
    // nProbe — the 100 TB dial — probing 8 of 64 lists scans ~12.5% of
    // the corpus vs 8 of 16 = 50% in the declared config.
    val lshHi = recallOf(Similarity.lshKnn(spark, qs, emb, k = 10, nTables = 8))
    val ivfFine = recallOf(
      Ivf.ivfKnn(spark, qs, emb, k = 10, nCentroids = 64, nProbe = 8, iters = 1))
    // the declared q_x_ann_pq path (m=8 × 32 codes, ADC top-160 →
    // exact rerank to 10; rerankFactor 16 since r8 — the documented
    // cheap dial, +0.15 recall for rerank-row cost only), plus the
    // old rerank-8 point for cross-round comparability.
    val pq = recallOf(Pq.pqKnn(spark, qs, emb, k = 10, rerankFactor = 16))
    val pqNarrow = recallOf(Pq.pqKnn(spark, qs, emb, k = 10, rerankFactor = 8))
    // IVF-PQ: declared path probes 4/16 lists (~25% scan at m-byte
    // code cost); the probe knob is the same recall dial as plain IVF.
    val ivfpq = recallOf(IvfPq.ivfPqKnn(spark, qs, emb, k = 10))
    val ivfpqP8 = recallOf(IvfPq.ivfPqKnn(spark, qs, emb, k = 10, nProbe = 8))
    println(f"""{"metric":"ann_recall@10","lsh_recall":$lsh%.4f,"ivf_recall":$ivf%.4f,"lsh_recall_8tables":$lshHi%.4f,"ivf_recall_c64_p8":$ivfFine%.4f,"pq_recall":$pq%.4f,"pq_recall_rerank8":$pqNarrow%.4f,"ivfpq_recall_p4":$ivfpq%.4f,"ivfpq_recall_p8":$ivfpqP8%.4f,"n_queries":${qs.count()},"n_exact_pairs":${total.toLong},"sf":"$sfDir"}""")
    spark.stop()
  }
}
