package graft

import graft.operators.Pca

class PcaSpec extends SparkSuite {
  import spark.implicits._

  test("jacobi eigensolver matches an analytic 2x2 case") {
    // [[2,1],[1,2]] has eigenvalues 3 and 1, vectors (1,1)/√2, (1,-1)/√2
    val (vals, vecs) = Pca.eigenSym(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    assert(math.abs(math.abs(vecs(0)(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(vecs(0)(0) - vecs(0)(1)) < 1e-12) // (1,1) direction
  }

  test("covariance matches a hand-computed small case") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(3.0f, 2.0f)),
      (3L, Array(5.0f, 4.0f))).toDF("vec_id", "embedding")
    val (n, mu, cov) = Pca.covariance(df, 2)
    assert(n == 3 && mu.toSeq == Seq(3.0, 2.0))
    // var = 4, cov = 4 (perfectly correlated, sample denominator n-1)
    assert(math.abs(cov(0)(0) - 4.0) < 1e-12)
    assert(math.abs(cov(0)(1) - 4.0) < 1e-12)
    assert(math.abs(cov(1)(1) - 4.0) < 1e-12)
  }

  test("planted anisotropy: top eigenvector recovered, spectrum dominated") {
    // 200 points along direction (3,4)/5 in 8 dims + small orthogonal jitter
    val dir = Array(0.6, 0.8, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val rows = (0 until 200).map { i =>
      val t = (i % 41) - 20.0 // spread along the direction
      val jit = ((i * 2654435761L) % 97) / 970.0 // deterministic small noise
      (i.toLong, Array.tabulate(8)(k =>
        (t * dir(k) + (if (k == 2) jit else 0.0)).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val (_, _, cov) = Pca.covariance(df, 8)
    val (vals, vecs) = Pca.eigenSym(cov)
    assert(vals(0) > 50 * vals(1), s"spectrum not dominated: ${vals.take(3).toSeq}")
    val cos = math.abs(vecs(0).zip(dir).map { case (a, b) => a * b }.sum)
    assert(cos > 0.999, s"top eigenvector misaligned: |cos|=$cos")
  }

  test("spectrum on the fixture: valid distribution, stable at 6dp") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val s1 = Pca.spectrum(spark, emb, 64).collect()
    assert(s1.length == 64)
    val vals = s1.map(_.getDouble(1))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b - 1e-12 }, "not sorted desc")
    assert(vals.forall(_ >= -1e-10), "negative eigenvalue")
    assert(math.abs(s1.last.getDouble(2) - 1.0) < 1e-9, "cum_frac must end at 1")
    // determinism at the declared rounding
    val s2 = Pca.spectrum(spark, emb, 64).collect()
    s1.zip(s2).foreach { case (a, b) =>
      assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 5e-7)
    }
  }
}
