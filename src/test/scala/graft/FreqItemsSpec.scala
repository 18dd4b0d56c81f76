package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** graft_freq_items (native Misra–Gries TypedImperativeAggregate):
  * the MG invariants must hold against exact counts after any
  * partitioning (update-only and merge-heavy paths), and the sketch
  * must degenerate to exact counts when k exceeds the distinct
  * cardinality.
  */
class FreqItemsSpec extends SparkSuite {
  import spark.implicits._

  private def tokens: DataFrame =
    Tables.table(spark, sfDir, "documents")
      .select(explode(functions.TextFunctions.tokens($"text")).as("w"))

  private def sketch(df: DataFrame, k: Int): (Map[String, Long], Long, Long) = {
    val row = df.agg(call_function("graft_freq_items", $"w", lit(k)).as("sk"))
      .select($"sk.terms", $"sk.err", $"sk.n").head()
    val terms = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (terms, row.getLong(1), row.getLong(2))
  }

  private def exact: Map[String, Long] =
    tokens.groupBy($"w").count().as[(String, Long)].collect().toMap

  test("MG invariants vs exact counts (k=50), update-heavy and merge-heavy") {
    val truth = exact
    val total = truth.values.sum
    for (parts <- Seq(1, 32)) {
      val (est, err, n) = sketch(tokens.repartition(parts), 50)
      assert(n === total)
      assert(est.size <= 50)
      // mergeable-summaries bound (Agarwal et al. 2013): the merge
      // that subtracts the (k+1)-th largest keeps err ≤ n/(k+1)
      // regardless of how many partials merged
      assert(err <= n / 51, s"error $err past the n/(k+1) bound (n=$n)")
      // est(x) ≤ true(x) ≤ est(x) + err
      est.foreach { case (t, e) =>
        assert(e <= truth(t) && truth(t) <= e + err, s"$t: est=$e true=${truth(t)} err=$err")
      }
      // no false negatives above the error bound
      truth.filter(_._2 > err).keys.foreach(t =>
        assert(est.contains(t), s"heavy hitter '$t' (${truth(t)} > $err) missing"))
    }
  }

  test("k above distinct cardinality → exact counts, zero error") {
    val small = Seq("a", "b", "a", "c", "a", "b").toDF("w")
    val (est, err, n) = sketch(small.repartition(3), 10)
    assert(n === 6 && err === 0)
    assert(est === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("nulls ignored; empty input → empty summary") {
    val withNulls = Seq(Some("x"), None, Some("x"), None).toDF("w")
    val (est, err, n) = sketch(withNulls, 4)
    assert(est === Map("x" -> 2L) && err === 0 && n === 2)
    val (e2, r2, n2) = sketch(Seq.empty[String].toDF("w"), 4)
    assert(e2.isEmpty && r2 === 0 && n2 === 0)
  }

  test("grouped aggregation: per-lang summaries hold the invariants") {
    val perLang = Tables.table(spark, sfDir, "documents")
      .select($"lang", explode(functions.TextFunctions.tokens($"text")).as("w"))
    val got = perLang.groupBy($"lang")
      .agg(call_function("graft_freq_items", $"w", lit(20)).as("sk"))
      .select($"lang", $"sk.err", size($"sk.terms").as("m")).collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getInt(2) <= 20))
  }

  test("SQL registration requires a literal k") {
    val viaSql = spark.sql(
      "SELECT graft_freq_items(w, 5).n AS n FROM (SELECT 'q' AS w)").head().getLong(0)
    assert(viaSql === 1L)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_freq_items('a', cast(id AS int) + 2) FROM range(1)").collect()
    }
    assert(err.getMessage.contains("literal"))
  }
}
