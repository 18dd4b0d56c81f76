package graft

import org.apache.spark.sql.functions._

import graft.operators.{IvfPq, Similarity}

class IvfPqSpec extends SparkSuite {
  import spark.implicits._

  private def emb = Tables.table(spark, sfDir, "embeddings")

  test("ivfPqKnn: k ranked results per query; recall vs brute force") {
    val qs = emb.filter($"vec_id" % 100 === 0)
    val approx = IvfPq.ivfPqKnn(spark, qs, emb, k = 10)
    val perQuery = approx.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"))
    assert(perQuery.filter($"n" =!= 10 || $"mx" =!= 10).isEmpty)

    val exact = Similarity.bruteForceKnn(qs, emb, k = 10)
      .select($"query_id", $"cand_id")
    val hits = approx.select($"query_id", $"cand_id").intersect(exact).count().toDouble
    val recall = hits / exact.count().toDouble
    info(f"IVF-PQ recall@10 = $recall%.3f (16 lists, probe 4, m=8x32 residual codes)")
    // probing 4/16 lists bounds recall at the IVF routing level; the
    // PQ stage on residuals should not lose much below that
    assert(recall > 0.4)
  }

  test("misuse contracts: probe/coarse/rerank bounds rejected eagerly") {
    intercept[IllegalArgumentException](IvfPq.ivfPqKnn(spark, emb, emb, k = 5, nProbe = 0))
    intercept[IllegalArgumentException](
      IvfPq.ivfPqKnn(spark, emb, emb, k = 5, nCoarse = 4, nProbe = 8))
    intercept[IllegalArgumentException](
      IvfPq.ivfPqKnn(spark, emb, emb, k = 5, rerankFactor = 0))
  }

  test("ivfPqKnn is deterministic across invocations") {
    val qs = emb.filter($"vec_id" % 200 === 0)
    val a = IvfPq.ivfPqKnn(spark, qs, emb, k = 5).collect().map(_.toString).sorted
    val b = IvfPq.ivfPqKnn(spark, qs, emb, k = 5).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }
}
