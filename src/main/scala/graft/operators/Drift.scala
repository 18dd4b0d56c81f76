package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Population-stability-index drift between a current sample and a
  * reference distribution — the same union-bucket +0.5-Laplace
  * convention as q_x_psi (which keeps its own per-source grouped
  * form; this is the global scalar the STREAMING monitor
  * ([[graft.streaming.StreamingJobs.driftSink]]) evaluates per
  * micro-batch — StreamingSketchDriftSpec pins the two to the same
  * behavior on identical inputs).
  *
  * Scale shape: each side collapses to a bucket histogram in one
  * aggregate before anything joins — the comparison itself is
  * bucket-grain regardless of input size. The reference histogram is
  * computed once and reused across batches (pass `refHist`), exactly
  * how a production monitor pins last month's profile.
  */
object Drift {

  /** Page–Hinkley monitor state: `n`/`sum` exact integer prefix
    * counts, `m` the running deviation sum Σ(c_i − mean_i − δ), `mn`
    * its running minimum (over s ≥ 1 — the empty state carries
    * Double.MaxValue, NOT 0, so m_0 is never a min candidate), and
    * `phMax` = max_t (m_t − mn_t), the alarm statistic.
    */
  case class PhState(n: Long, sum: Long, m: Double, mn: Double, phMax: Double)

  /** Empty Page–Hinkley state (no observations folded yet). */
  val phInit: PhState = PhState(0L, 0L, 0.0, Double.MaxValue, 0.0)

  /** One Page–Hinkley step at δ = 0.5 — THE single definition of the
    * fold: the batch query (q_x_page_hinkley) and the streaming
    * monitor ([[graft.streaming.StreamingJobs.pageHinkleySink]]) both
    * call this, so stream-after-N-batches ≡ one-shot batch is by
    * construction (and spec-asserted). Expression order matters for
    * the oracle's bit-identity — do not reassociate.
    */
  def phStep(st: PhState, c: Long): PhState = {
    val sum2 = st.sum + c
    val n2 = st.n + 1
    val m2 = st.m + (c - sum2.toDouble / n2 - 0.5)
    val mn2 = math.min(st.mn, m2)
    PhState(n2, sum2, m2, mn2, math.max(st.phMax, m2 - mn2))
  }

  /** Bucket histogram of `valueCol` at `width`-sized buckets. */
  def histogram(df: DataFrame, valueCol: Column, width: Double): DataFrame = {
    require(width > 0, "bucket width must be positive")
    df.select(floor(valueCol / width).cast("long").as("bucket"))
      .filter(col("bucket").isNotNull)
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))
  }

  /** PSI of `curHist` against `refHist` (both (bucket, c)): union
    * bucket universe, +0.5 Laplace smoothing — the exact q_x_psi
    * convention. Returns (psi, n_cur). Empty current sample → PSI of
    * the smoothing floor (finite, never a throw).
    */
  def psi(curHist: DataFrame, refHist: DataFrame): (Double, Long) = {
    val co = refHist.select(col("bucket"), col("c").as("c_old"))
    val cn = curHist.select(col("bucket"), col("c").as("c_new"))
    val uni = co.select(col("bucket")).union(cn.select(col("bucket"))).distinct()
    // persist the joined grain ONCE: both the totals pass and the
    // per-bucket pass read it, and on the streaming hot path an
    // unpersisted lineage would recompute BOTH input histograms twice
    // per micro-batch (review finding)
    val joined = uni
      .join(co, Seq("bucket"), "left")
      .join(cn, Seq("bucket"), "left")
      .na.fill(0L, Seq("c_old", "c_new"))
      .persist()
    try {
      val row = joined
        .agg(sum(col("c_old")).as("n_old"), sum(col("c_new")).as("n_new"),
          count(lit(1)).as("nb"))
        .crossJoin(joined.select(col("bucket"), col("c_old"), col("c_new")))
        .withColumn("p", (col("c_old") + 0.5) / (col("n_old") + col("nb") * 0.5))
        .withColumn("q", (col("c_new") + 0.5) / (col("n_new") + col("nb") * 0.5))
        .agg(sum((col("p") - col("q")) * log(col("p") / col("q"))).as("psi"),
          max(col("n_new")).as("n_cur"))
        .head()
      // both histograms empty (e.g. all-NULL value columns): no
      // buckets anywhere → zero drift by definition, never a throw
      if (row.isNullAt(0)) (0.0, 0L)
      else (row.getDouble(0), row.getLong(1))
    } finally { joined.unpersist(); () }
  }
}
