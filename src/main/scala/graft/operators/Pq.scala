package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Product quantization (PQ) approximate nearest neighbor search
  * (SURVEY.md §2.8 "similarity search … an IVF or LSH-bucketed
  * variant as the scale path" — PQ is the third classic scale path,
  * the one that compresses the CORPUS rather than bucketing it).
  *
  * Structure: the D-dim embedding space is split into `m` orthogonal
  * subspaces of D/m dims; each subspace gets its own small k-means
  * codebook (trained exactly like [[Ivf.train]]: hash-spread
  * deterministic seeding + Lloyd rounds, all `m` codebooks in ONE
  * DataFrame pass, keyed by subspace). A corpus vector is then stored
  * as `m` small integer codes — at k≤256 that is m BYTES per vector
  * vs 4·D for the raw floats (32× at D=64, m=8), which is the whole
  * point at 100 TB: the scored representation fits in a fraction of
  * the footprint, and the raw embeddings are touched only for the
  * final exact rerank of a few dozen candidates per query.
  *
  * Query scoring is ADC (asymmetric distance computation): per query,
  * a lookup table of squared distances from the query's subvector to
  * every centroid in every subspace (m·k doubles — tiny) is built and
  * broadcast; a candidate's approximate distance is the sum of m
  * table lookups indexed by its codes — the codegen'd
  * [[graft.functions.AdcLookup]] expression (`graft_adc`), an m-step
  * primitive loop in whole-stage codegen, no per-row vector math.
  *
  * Scale shape: codebooks are tiny and broadcast both during encode
  * (map-side argmin per subvector, one shuffle per Lloyd round
  * grouped by (subspace, centroid)) and during scoring (per-query LUT
  * crossJoin-broadcast against the code table). The only data-sized
  * shuffle is the per-query top-R candidate window over scored codes
  * — the same shape as brute force, but each row carries m bytes of
  * codes instead of a D-dim float vector and scoring is m lookups
  * instead of D multiplies. The exact rerank then touches raw
  * embeddings for only R = rerankFactor·k rows per query.
  */
object Pq {

  /** L2-normalize embeddings (float → unit double vectors). PQ scores
    * by squared L2 while the engine's similarity contract is cosine;
    * on unit vectors ‖a−b‖² = 2 − 2·cos(a,b), so quantizing the
    * NORMALIZED space makes the ADC ordering approximate the cosine
    * ordering for ANY input scaling. (The fixture's vectors happen to
    * be unit-norm already — this pass is the guarantee, not a fixture
    * assumption.)
    */
  private[operators] def normalized(vectors: DataFrame): DataFrame =
    vectors
      .withColumn("nrm", sqrt(aggregate(
        transform(col("embedding"), x => x.cast("double") * x.cast("double")),
        lit(0.0), (a, v) => a + v)))
      // an all-zero vector has nrm 0; dividing by 1 keeps it at the
      // origin instead of injecting 0/0 = NaN into codebook training
      // (a NaN row would poison every centroid mean it touches)
      .withColumn("nrm", when(col("nrm") === 0.0, lit(1.0)).otherwise(col("nrm")))
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double") / col("nrm")).as("embedding"))

  /** The per-subspace slicing expression over a named vector column:
    * array of `m` double subvectors. Subspace width is size/m —
    * derived per row, so any uniform dimension divisible by m works;
    * a row whose dimension is NOT divisible by m (or < m) fails the
    * job with a clear message rather than silently dropping the
    * trailing dimensions from every distance computation.
    */
  private[operators] def sliceExpr(vecCol: String, m: Int) =
    expr(
      s"""IF($vecCol IS NULL, NULL,
          |  IF(size($vecCol) % $m = 0 AND size($vecCol) >= $m,
          |    transform(sequence(0, $m - 1),
          |      i -> transform(
          |             slice($vecCol, i * (size($vecCol) div $m) + 1,
          |                   size($vecCol) div $m),
          |             x -> CAST(x AS DOUBLE))),
          |    raise_error(concat('graft PQ: vector dimension ',
          |      CAST(size($vecCol) AS STRING),
          |      ' is not divisible by m=$m subspaces'))))""".stripMargin)

  /** Explode vectors into `m` per-subspace double subvectors:
    * (vec_id, sub, subvec). `normalize = false` skips the unit-norm
    * pass — for inputs that are residuals (IVF-PQ), where normalizing
    * would distort the space PQ must quantize.
    */
  private[operators] def subVecs(raw: DataFrame, m: Int, normalize: Boolean = true): DataFrame =
    (if (normalize) normalized(raw) else raw.select(col("vec_id"), col("embedding")))
      .select(col("vec_id"), posexplode(sliceExpr("embedding", m)).as(Seq("sub", "subvec")))

  /** Squared L2 over two already-double arrays, folded strictly
    * left-to-right (cross-engine deterministic, same contract as
    * [[VectorFunctions.sqDist]]).
    */
  private[operators] def sqd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Nearest-centroid assignment within each subspace. `codebooks`
    * is tiny (m·k rows) and broadcast; ties break on centroid id so
    * assignment is deterministic.
    */
  private[operators] def assign(sv: DataFrame, codebooks: DataFrame): DataFrame = {
    val j = sv.join(broadcast(codebooks), Seq("sub"))
      .withColumn("d2", sqd(col("subvec"), col("centroid")))
    val w = Window.partitionBy(col("vec_id"), col("sub")).orderBy(col("d2"), col("cid"))
    j.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "d2", "centroid")
  }

  /** Train all `m` codebooks (k centroids each) in one pass, keyed by
    * subspace. Deterministic seeding: per subspace, the k subvectors
    * with the smallest xxhash64(vec_id, sub) — a hash-spread sample
    * via a window ranked within each subspace partition (m partitions,
    * never a single-partition sort). `iters` Lloyd rounds follow, each
    * a broadcast-argmin + one groupBy((sub, cid), pos) shuffle of
    * dimension-wise means. Returns (sub, cid, code, centroid) where
    * `code` is the dense 0..k-1 index used by ADC lookup tables —
    * ranked by cid within each subspace (m·k rows total, partitioned
    * window, cheap and deterministic).
    */
  def train(spark: SparkSession, corpus: DataFrame, m: Int, k: Int,
      iters: Int = 1, normalize: Boolean = true): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    require(k >= 2, s"k must be >= 2 centroids per subspace, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val sv = subVecs(corpus, m, normalize)
    val wSeed = Window.partitionBy(col("sub"))
      .orderBy(xxhash64(col("vec_id"), col("sub")), col("vec_id"))
    var cb = sv.withColumn("rn", row_number().over(wSeed))
      .filter(col("rn") <= k)
      .select(col("sub"), col("vec_id").as("cid"), col("subvec").as("centroid"))

    (0 until iters).foreach { _ =>
      cb = assign(sv, cb)
        .select(col("sub"), col("cid"), posexplode(col("subvec")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg(avg(col("x")).as("mn"))
        .groupBy(col("sub"), col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mn")))).as("pm"))
        .select(col("sub"), col("cid"), expr("transform(pm, p -> p.mn)").as("centroid"))
    }
    val wCode = Window.partitionBy(col("sub")).orderBy(col("cid"))
    // guarded cache (same rationale as Ivf.train): the codebook is
    // reused by encode + the query LUT; lazy, so training runs on
    // first action, and bench warm/timed reruns don't re-cache.
    org.apache.spark.sql.graft.Shim.cacheIfNeeded(
      cb.withColumn("code", (row_number().over(wCode) - 1).cast("int")))
  }

  /** Encode each corpus vector as its `m` dense codes, ordered by
    * subspace: (vec_id, codes array<int>). This is the compressed
    * representation a 100 TB deployment would persist.
    */
  def encode(corpus: DataFrame, codebooks: DataFrame, m: Int,
      normalize: Boolean = true): DataFrame =
    assign(subVecs(corpus, m, normalize), codebooks.select(col("sub"), col("cid"), col("code"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("code")))).as("sc"))
      .select(col("vec_id"), expr("transform(sc, s -> s.code)").as("codes"))

  /** Approximate top-k via PQ/ADC with exact cosine rerank.
    *
    * ADC picks rerankFactor·k candidates per query by compressed
    * squared-L2 (sum of m LUT lookups, deterministic left-to-right
    * fold, ties on cand id); the final k are ranked by EXACT cosine
    * over raw embeddings, rounded to 9dp with id tie-breaks — the
    * same output contract as [[Similarity.bruteForceKnn]] /
    * [[Ivf.ivfKnn]], so recall is directly comparable.
    *
    * Measured recall@10 dials on the 500-vector fixture (5 queries,
    * m=8): kCodes×rerankFactor are the knobs — 16×4: 0.42, 32×4:
    * 0.58, 32×8: 0.86 (the default), 32×16: 0.96; a Lloyd round
    * (iters=3) adds ~0.04 at each point. Cost: kCodes scales the
    * (tiny) LUT and codebook, rerankFactor scales only the exact
    * rerank row count — both leave the corpus-sized ADC pass
    * untouched, which is why rerank is the cheap dial.
    */
  def pqKnn(spark: SparkSession, queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 8, kCodes: Int = 32, iters: Int = 1, rerankFactor: Int = 8,
      memoKey: Option[String] = None): DataFrame = {
    require(rerankFactor >= 1, s"rerankFactor must be >= 1, got $rerankFactor")
    graft.functions.GraftFunctions.register(spark)
    // memoKey names the corpus (e.g. the fixture dir); with bench
    // caching on, train + encode run once per (corpus, params) and the
    // timed reruns score against the pinned index — the production
    // shape (index trained once per snapshot, codes table persisted).
    // Verify/specs pass no key and build fresh.
    def memo(part: String)(build: => DataFrame): DataFrame =
      memoKey.fold(build)(mk =>
        AnnCache.memo(spark, s"pq-$part:$mk:m=$m,k=$kCodes,iters=$iters")(build))
    val cb = memo("codebook")(train(spark, corpus, m, kCodes, iters))
    val codes = memo("codes")(encode(corpus, cb, m))

    // per-query ADC lookup table: lut[sub][code] = ||q_sub - c||²,
    // assembled as array<array<double>> ordered by (sub, code). ONE
    // aggregate builds the whole m×kCodes matrix: collect every
    // (sub, code, pd) cell, sort once (deterministic total order),
    // and carve the nested array with order-preserving filter — the
    // former per-(query, sub) pre-aggregate added a second exchange
    // for no reduction (every cell still reached the final group).
    val lut = subVecs(queries.select(col("vec_id"), col("embedding")), m)
      .join(broadcast(cb), Seq("sub"))
      .withColumn("pd", sqd(col("subvec"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("code"), col("pd")))).as("sl"))
      .select(col("vec_id").as("query_id"),
        expr(s"transform(sequence(0, ${m - 1}), " +
          "s -> transform(filter(sl, c -> c.sub = s), c -> c.pd))").as("lut"))

    // score every code row against every query LUT: map-side over the
    // compressed codes (broadcast LUTs), then per-query top-R window
    val scored = codes.crossJoin(broadcast(lut))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc", call_function("graft_adc", col("codes"), col("lut")))
    // asc_nulls_last: graft_adc surfaces corrupted codes as NULL
    // scores — default nulls-first would let them crowd the real
    // candidates out of the rerank pool
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc_nulls_last, col("vec_id"))
    val cands = scored.withColumn("rn", row_number().over(wAdc))
      .filter(col("rn") <= rerankFactor * k)
      .select(col("query_id"), col("vec_id").as("cand_id"))

    // exact rerank of the R candidates: raw embeddings touched only here
    val rer = cands
      .join(corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cv")), Seq("cand_id"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))), Seq("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 9))
    val wCos = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
    rer.withColumn("rank", row_number().over(wCos))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("rank").cast("int").as("rank"), col("cos"))
  }
}
