package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed PCA over an embedding corpus — the intrinsic-
  * dimensionality audit (how many directions carry the variance) and
  * the front door to projection-based compression.
  *
  * Scale shape: ALL corpus-sized work is literally ONE aggregation
  * pass — each row's flattened outer product, the vector itself, and
  * a count entry explode into the same-stage hash aggregate, so the
  * corpus is read once and the shuffle carries (d²+d+1)·partitions
  * partials, never n·d² rows. Only the d×d covariance (64×64 = 32 KB
  * here) reaches the driver, where a cyclic Jacobi eigensolver runs —
  * driver-side by DIMENSION, not by corpus size, the same
  * justification as broadcasting k centroids.
  *
  * Numerical honesty: eigenVALUES are stable under the ~1e-15
  * partition-order drift of the double aggregates (Weyl: |Δλ| ≤
  * ‖ΔC‖), so the spectrum rounds safely at 6dp. EigenVECTORS of
  * near-degenerate spectra (e.g. isotropic corpora like the fixture)
  * are NOT reproducible across engines and are deliberately not part
  * of any declared query output; PcaSpec asserts vector recovery only
  * on planted-anisotropy data where the gap makes them stable.
  */
object Pca {

  /** (n, mean[d], cov[d][d]) of the `embedding` column — ONE corpus
    * pass: each row emits its flattened outer product (d² entries)
    * concatenated with the vector itself (d first-moment entries) and
    * a trailing 1 (the row count), all folded by the same-stage hash
    * aggregate — the shuffle carries d²+d+1 partials per partition,
    * never n·d² rows. Cov is the sample covariance (n−1 denominator).
    */
  def covariance(emb: DataFrame, dim: Int): (Long, Array[Double], Array[Array[Double]]) = {
    import emb.sparkSession.implicits._
    // One corpus pass as a primitive-array fold (r17, guide §4.2): the
    // previous posexplode form materialized d²+d+1 rows PER INPUT ROW
    // into a hash aggregate (~8.3 M rows for 2 k vectors at d=64) —
    // the per-row overhead of generate + hash-probe dwarfed the d²/2
    // fused multiply-adds that are the actual work. Each task now
    // folds its rows into one preallocated upper-triangle accumulator
    // (symmetry halves the products) and only the (dim²+dim)/2+dim+1
    // partials per partition are combined — the same shuffle bytes as
    // before, ~20x less per-row work, identical math up to the usual
    // partition-order double-accumulation drift the 6dp output
    // rounding absorbs (Weyl; spectrum scaladoc).
    val triLen = dim * (dim + 1) / 2
    val zero = (0L, new Array[Double](dim), new Array[Double](triLen))
    val (n, s1, tri) = emb
      .select(col("embedding").cast("array<double>").as("v"))
      .as[Array[Double]]
      .rdd
      .treeAggregate(zero)(
        seqOp = { case ((cnt, sums, prods), v) =>
          // per-row dimension guard (same loud-failure stance as the
          // posexplode form): a short/null row would otherwise fold
          // into the wrong accumulator slots silently
          require(v != null && v.length == dim,
            s"graft PCA: embedding dimension ${if (v == null) -1 else v.length} != expected $dim")
          var i = 0
          var t = 0
          while (i < dim) {
            val vi = v(i)
            sums(i) += vi
            var j = i
            while (j < dim) { prods(t) += vi * v(j); j += 1; t += 1 }
            i += 1
          }
          (cnt + 1L, sums, prods)
        },
        combOp = { case ((c1, s1a, p1), (c2, s2a, p2)) =>
          var i = 0
          while (i < dim) { s1a(i) += s2a(i); i += 1 }
          var t = 0
          while (t < triLen) { p1(t) += p2(t); t += 1 }
          (c1 + c2, s1a, p1)
        })
    require(n >= 2, s"covariance needs >= 2 rows, got $n")
    val mu = Array.tabulate(dim)(i => s1(i) / n)
    // unpack the upper triangle: tri index of (i, j), i <= j, is
    // i*dim - i(i-1)/2 + (j - i)
    def triAt(i: Int, j: Int): Double = {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      tri(a * dim - a * (a - 1) / 2 + (b - a))
    }
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      (triAt(i, j) - n.toDouble * mu(i) * mu(j)) / (n - 1).toDouble
    }
    (n, mu, cov)
  }

  /** Symmetric eigendecomposition via cyclic Jacobi rotations —
    * deterministic, dependency-free, ample for d ≤ a few hundred.
    * Returns (eigenvalues desc, eigenvectors as rows, same order).
    */
  def eigenSym(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    while (offDiag() > 1e-20 && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // branch form keeps theta == 0 rotating (t = 1, the 45°
            // case for equal diagonal entries) — signum(0) = 0 would
            // silently skip it
            val t = if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                    else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until d).map(k => v(k)(i)).toArray).toArray)
  }

  /** Eigenvalue spectrum of the corpus covariance as a tiny local
    * DataFrame: (rank, eigenvalue, cum_frac of total variance).
    */
  def spectrum(spark: SparkSession, emb: DataFrame, dim: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("eigenvalue", DoubleType, nullable = false),
      StructField("cum_frac", DoubleType, nullable = false)))
    // degenerate corpus (< 2 rows — e.g. an empty partition/day):
    // no covariance exists; emit an empty spectrum, never throw
    if (emb.limit(2).count() < 2)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    val (_, _, cov) = covariance(emb, dim)
    val (vals, _) = eigenSym(cov)
    val total = vals.sum
    var cum = 0.0
    // zero total variance (n >= 2 identical embeddings): cum/total
    // would be NaN; emit 0.0 — same never-throw stance as the <2-row
    // case above
    val rows = vals.zipWithIndex.map { case (ev, i) =>
      cum += ev
      Row(i + 1, ev, if (total <= 0.0) 0.0 else cum / total)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }
}
