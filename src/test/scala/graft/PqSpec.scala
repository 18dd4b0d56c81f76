package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}

class PqSpec extends SparkSuite {
  import spark.implicits._

  private def emb = Tables.table(spark, sfDir, "embeddings")

  test("train builds m codebooks of k dense-coded centroids, deterministic") {
    val cb1 = Pq.train(spark, emb, m = 8, k = 4, iters = 1)
      .as[(Int, Long, Seq[Double], Int)].collect().sortBy(r => (r._1, r._2))
    val cb2 = Pq.train(spark, emb, m = 8, k = 4, iters = 1)
      .as[(Int, Long, Seq[Double], Int)].collect().sortBy(r => (r._1, r._2))
    assert(cb1.length === 32) // m=8 subspaces × k=4
    assert(cb1.map(_._1).distinct.sorted === (0 until 8))
    // dense codes 0..k-1 within every subspace; centroids are D/m = 8 wide
    cb1.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted === (0 until 4))
      assert(rows.forall(_._3.size === 8))
    }
    assert(cb1.toSeq === cb2.toSeq)
  }

  test("encode: every vector gets m in-range codes") {
    val cb = Pq.train(spark, emb, m = 8, k = 4, iters = 1)
    val codes = Pq.encode(emb, cb, m = 8).as[(Long, Seq[Int])].collect()
    assert(codes.length === emb.count())
    assert(codes.forall(_._2.length === 8))
    assert(codes.forall(_._2.forall(c => c >= 0 && c < 4)))
  }

  test("pqKnn: k ranked results per query; recall vs brute force > 0.6") {
    val qs = emb.filter($"vec_id" % 100 === 0)
    val approx = Pq.pqKnn(spark, qs, emb, k = 10)
    val perQuery = approx.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"))
    assert(perQuery.filter($"n" =!= 10 || $"mx" =!= 10).isEmpty)

    val exact = Similarity.bruteForceKnn(qs, emb, k = 10)
      .select($"query_id", $"cand_id")
    val hits = approx.select($"query_id", $"cand_id").intersect(exact).count().toDouble
    val recall = hits / exact.count().toDouble
    info(f"PQ recall@10 = $recall%.3f (m=8, 32 codes, rerank 8x)")
    assert(recall > 0.6)
  }

  test("incremental indexing: new vectors encode against existing codebooks, codes stable") {
    // the production maintenance path: train once on the corpus
    // snapshot, encode arriving batches against the FROZEN codebooks —
    // a vector's codes must not depend on which batch it arrived in
    val cb = Pq.train(spark, emb, m = 8, k = 4, iters = 1)
    val full = Pq.encode(emb, cb, m = 8)
      .as[(Long, Seq[Int])].collect().toMap
    val batch = Pq.encode(emb.filter($"vec_id" % 10 === 3), cb, m = 8)
      .as[(Long, Seq[Int])].collect()
    assert(batch.nonEmpty)
    batch.foreach { case (id, codes) => assert(codes === full(id)) }
  }

  test("indivisible dimension fails loudly instead of dropping tail dims") {
    val ex = intercept[Exception] {
      Pq.train(spark, emb, m = 7, k = 4).collect() // 64 % 7 != 0
    }
    assert(ex.getMessage.contains("not divisible"),
      s"expected the raise_error message, got: ${ex.getMessage}")
  }

  test("all-zero vectors normalize to the origin, not NaN") {
    val z = Seq((1L, Seq.fill(8)(0.0f)), (2L, Seq(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val cb = Pq.train(spark, z, m = 2, k = 2)
    assert(cb.collect().forall(r => !r.getSeq[Double](2).exists(_.isNaN)))
  }

  test("misuse contracts: bad m/k/iters/rerankFactor rejected eagerly") {
    intercept[IllegalArgumentException](Pq.train(spark, emb, m = 0, k = 16))
    intercept[IllegalArgumentException](Pq.train(spark, emb, m = 8, k = 1))
    intercept[IllegalArgumentException](Pq.train(spark, emb, m = 8, k = 16, iters = -1))
    intercept[IllegalArgumentException](Pq.pqKnn(spark, emb, emb, k = 5, rerankFactor = 0))
  }

  test("pqKnn is deterministic across invocations") {
    val qs = emb.filter($"vec_id" % 200 === 0)
    val a = Pq.pqKnn(spark, qs, emb, k = 5).collect().map(_.toString).sorted
    val b = Pq.pqKnn(spark, qs, emb, k = 5).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }
}
