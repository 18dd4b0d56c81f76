package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Cuts.CutOps
import graft.Tables.table

/** Round-14 wave 2 (SURVEY.md §2.8h): residual/randomness diagnostics
  * over each event type's daily count series — the Ljung–Box
  * portmanteau (the standard "is there ANY autocorrelation in the
  * first m lags" test a forecasting pipeline runs on residuals) and
  * the von Neumann successive-difference ratio (the classic
  * mean-square-successive-difference randomness test).
  *
  * Both follow the §2.8g scale contract: ONE map-side-partial pass
  * reduces the corpus to (event_type, day) grain; every later step is
  * a per-type window or aggregate over calendar-bounded rows. Both
  * are declared at OBSERVATION-INDEX grain: the series is the
  * day-ordered sequence of daily counts, and calendar gaps close
  * ranks (lag k = k observations back, not k days back) — the
  * declared convention, mirrored in the oracle.
  *
  * Cross-engine determinism: every aggregate is an exact BIGINT sum
  * (Σc, Σc², Σc·lag_k(c), Σ(Δc)²); the statistics evaluate as ONE
  * textually-shared double expression over those integers, so Spark
  * and DuckDB compute bit-identical doubles.
  */
object Round14b {
  type Q = (SparkSession, String) => DataFrame

  /** Declared Ljung–Box lag depth. */
  private val LbLags = 7

  private def dayCounts(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))

  /** Shared double-expression text over the exact integer aggregates
    * (n, sc, sq, and per-lag pk/ak/bk). `mean` and `den` are the
    * series mean and the centered sum of squares Σ(x−x̄)².
    */
  private val MeanTxt = "(CAST(sc AS DOUBLE) / n)"
  private val DenTxt = "(CAST(sq AS DOUBLE) - CAST(sc AS DOUBLE) * sc / n)"

  /** Lag-k sample autocorrelation from exact sums: r_k =
    * (Σ x_t·x_{t−k} − x̄·Σ_{t>k} x_t − x̄·Σ_{t≤n−k} x_t + (n−k)·x̄²)
    * / Σ(x−x̄)².
    */
  private def rkTxt(k: Int): String =
    s"""((CAST(p$k AS DOUBLE) - $MeanTxt * a$k - $MeanTxt * b$k
        + (n - $k) * $MeanTxt * $MeanTxt) / $DenTxt)"""

  /** Q_LB = n(n+2) Σ_{k=1..m} r_k²/(n−k), textually unrolled so both
    * engines add the m terms in the same left-to-right order.
    */
  private val QlbTxt: String =
    s"(CAST(n AS DOUBLE) * (n + 2) * (" +
      (1 to LbLags).map(k => s"${rkTxt(k)} * ${rkTxt(k)} / (n - $k)")
        .mkString(" + ") + "))"

  val defs: Map[String, Q] = Map(

    // Ljung–Box portmanteau per event type over daily counts
    // (DECLARED m = 7 lags, observation-index grain): Q =
    // n(n+2)Σ r_k²/(n−k). The per-lag cross-moments Σ x_t·x_{t−k}
    // and the two tail sums are exact BIGINTs from ONE window pass
    // (7 lag columns over the same per-type day-ordered window);
    // r_k expands the centered product algebraically so no double
    // accumulates across rows. Types with n ≤ m or a constant
    // series (Σ(x−x̄)² = 0) surface with NULL q_lb — declared, not
    // dropped.
    "q_x_ljung_box" -> ((s, d) => {
      val dc = dayCounts(s, d).cut("Round14b.scala:ljung_box", eager = true)
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val lagged = (1 to LbLags).foldLeft(dc) { (df, k) =>
        df.withColumn(s"l$k", lag(col("c"), k).over(w))
      }
      val aggs =
        Seq(count(lit(1)).as("n"), sum(col("c")).as("sc"),
          sum(col("c") * col("c")).as("sq")) ++
          (1 to LbLags).flatMap { k =>
            Seq(sum(col("c") * col(s"l$k")).as(s"p$k"),
              sum(when(col(s"l$k").isNotNull, col("c"))).as(s"a$k"),
              sum(col(s"l$k")).as(s"b$k"))
          }
      lagged.groupBy(col("event_type")).agg(aggs.head, aggs.tail: _*)
        .selectExpr("event_type", "n AS n_days",
          s"""CASE WHEN n > 1 AND $DenTxt > 0
                THEN round(${rkTxt(1)}, 6) ELSE NULL END AS r1""",
          s"""CASE WHEN n > $LbLags AND $DenTxt > 0
                THEN round($QlbTxt, 6) ELSE NULL END AS q_lb""")
        .orderBy(col("event_type"))
    }),

    // Von Neumann successive-difference ratio per event type:
    // vn = Σ_{t=2..n}(x_t − x_{t−1})² / Σ(x − x̄)² — trend/positive
    // autocorrelation pushes vn below 2, oscillation above. The
    // numerator is an exact BIGINT from the same one-pass lag
    // window; z uses the DECLARED asymptotic moments E = 2,
    // Var = 4(n−2)/(n²−1). Types with n < 3 or a constant series
    // surface with NULL vn/z.
    "q_x_von_neumann" -> ((s, d) => {
      val dc = dayCounts(s, d).cut("Round14b.scala:von_neumann", eager = true)
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      dc.withColumn("l1", lag(col("c"), 1).over(w))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
          sum(col("c") * col("c")).as("sq"),
          sum((col("c") - col("l1")) * (col("c") - col("l1"))).as("sd2"))
        .selectExpr("event_type", "n AS n_days",
          s"""CASE WHEN n >= 3 AND $DenTxt > 0
                THEN round(CAST(sd2 AS DOUBLE) / $DenTxt, 6)
                ELSE NULL END AS vn""",
          s"""CASE WHEN n >= 3 AND $DenTxt > 0
                THEN round((CAST(sd2 AS DOUBLE) / $DenTxt - 2)
                  / sqrt(4.0 * (n - 2) / ((CAST(n AS DOUBLE) - 1) * (n + 1))), 6)
                ELSE NULL END AS z""")
        .orderBy(col("event_type"))
    })
  )

  private val OracleDc =
    """dc AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2)"""

  val oracle: Map[String, String] = Map(

    // Same lag window (observation-index grain: ORDER BY day closes
    // calendar gaps), same exact BIGINT sums, same expression text.
    "q_x_ljung_box" -> {
      val lagCols = (1 to LbLags)
        .map(k => s"lag(c, $k) OVER (PARTITION BY event_type ORDER BY day) AS l$k")
        .mkString(",\n                 ")
      val aggCols = (1 to LbLags).map { k =>
        s"""CAST(sum(c * l$k) AS BIGINT) AS p$k,
                 CAST(sum(CASE WHEN l$k IS NOT NULL THEN c END) AS BIGINT) AS a$k,
                 CAST(sum(l$k) AS BIGINT) AS b$k"""
      }.mkString(",\n                 ")
      s"""WITH $OracleDc,
         lg AS (SELECT event_type, c,
                 $lagCols
               FROM dc),
         g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(c) AS BIGINT) AS sc,
                 CAST(sum(c * c) AS BIGINT) AS sq,
                 $aggCols
               FROM lg GROUP BY event_type)
         SELECT event_type, n AS n_days,
                CASE WHEN n > 1 AND $DenTxt > 0
                     THEN round(${rkTxt(1)}, 6) ELSE NULL END AS r1,
                CASE WHEN n > $LbLags AND $DenTxt > 0
                     THEN round($QlbTxt, 6) ELSE NULL END AS q_lb
         FROM g ORDER BY event_type"""
    },

    // Same one-lag window and declared asymptotic moments.
    "q_x_von_neumann" ->
      s"""WITH $OracleDc,
         lg AS (SELECT event_type, c,
                 lag(c, 1) OVER (PARTITION BY event_type ORDER BY day) AS l1
               FROM dc),
         g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(c) AS BIGINT) AS sc,
                 CAST(sum(c * c) AS BIGINT) AS sq,
                 CAST(sum((c - l1) * (c - l1)) AS BIGINT) AS sd2
               FROM lg GROUP BY event_type)
         SELECT event_type, n AS n_days,
                CASE WHEN n >= 3 AND $DenTxt > 0
                     THEN round(CAST(sd2 AS DOUBLE) / $DenTxt, 6)
                     ELSE NULL END AS vn,
                CASE WHEN n >= 3 AND $DenTxt > 0
                     THEN round((CAST(sd2 AS DOUBLE) / $DenTxt - 2)
                       / sqrt(4.0 * (n - 2) / ((CAST(n AS DOUBLE) - 1) * (n + 1))), 6)
                     ELSE NULL END AS z
         FROM g ORDER BY event_type"""
  )
}
