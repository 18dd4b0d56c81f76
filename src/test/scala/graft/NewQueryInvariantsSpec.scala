package graft

import org.apache.spark.sql.functions._

/** Sharp invariants of the round-7 query wave — properties the oracle
  * hash can't articulate (it only proves equality, not sanity).
  */
class NewQueryInvariantsSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("feat_hash vectors are unit L2 per doc") {
    val bad = run("q_x_feat_hash")
      .groupBy(col("doc_id"))
      .agg(abs(sum(col("weight") * col("weight")) - 1.0).as("err"))
      .filter(col("err") > 1e-4) // weights round at 6dp; 16 dims
      .count()
    assert(bad == 0, s"$bad docs with non-unit hashed vectors")
  }

  test("pmi pair df bounded by each term's df") {
    val docs = Tables.table(spark, sfDir, "documents")
    val tok = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("t"))
    val df = tok.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val viol = run("q_x_pmi")
      .join(df.select(col("t").as("term_a"), col("df").as("dfa")), "term_a")
      .join(df.select(col("t").as("term_b"), col("df").as("dfb")), "term_b")
      .filter(col("df_ab") > least(col("dfa"), col("dfb")))
      .count()
    assert(viol == 0, s"$viol pairs with df_ab above a member df")
  }

  test("markov transition probabilities row-normalize to 1") {
    val bad = run("q_x_markov")
      .groupBy(col("prev_type")).agg(abs(sum(col("p")) - 1.0).as("err"))
      .filter(col("err") > 1e-4).count() // p rounds at 6dp, |types| terms
    assert(bad == 0)
  }

  test("winsorize clip counts respect the exact-percentile bound") {
    val viol = run("q_x_winsorize")
      // strictly-below-P01 (strictly-above-P99) count is at most
      // ceil(0.01 n) for the exact interpolated percentile
      .filter(col("n_clip_low") > ceil(col("n") * 0.01)
        || col("n_clip_high") > ceil(col("n") * 0.01))
      .count()
    assert(viol == 0)
  }

  test("snapshot_diff contents conserve: old = removed + retained, new = added + retained") {
    val m = run("q_x_snapshot_diff").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = Tables.table(spark, sfDir, "documents")
    def nDistinct(mod: Int) = docs.filter(col("doc_id") % mod =!= 0)
      .select(sha2(col("text"), 256)).distinct().count()
    assert(m.getOrElse("removed", 0L) + m.getOrElse("retained", 0L) == nDistinct(7))
    assert(m.getOrElse("added", 0L) + m.getOrElse("retained", 0L) == nDistinct(5))
  }

  test("bootstrap replicate means bracket the true mean collectively") {
    val docs = Tables.table(spark, sfDir, "documents")
    val trueMean = docs.agg(avg(col("n_chars"))).head().getDouble(0)
    val means = run("q_x_bootstrap").select(col("boot_mean"))
      .collect().map(_.getDouble(0))
    assert(means.length == 20)
    // Poisson(1) resamples of 500 docs: every replicate within ±15%
    // and the replicate average within ±5% of the true mean
    assert(means.forall(m => math.abs(m - trueMean) / trueMean < 0.15))
    assert(math.abs(means.sum / means.length - trueMean) / trueMean < 0.05)
  }

  test("rrf output is a valid per-query ranking") {
    val out = run("q_x_rrf")
    val perQuery = out.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n"), min(col("rank")).as("lo"), max(col("rank")).as("hi"),
        countDistinct(col("rank")).as("nd"))
      .filter(col("n") =!= 10 || col("lo") =!= 1 || col("hi") =!= 10
        || col("nd") =!= 10)
      .count()
    assert(perQuery == 0, "each query must have ranks exactly 1..10")
    assert(out.filter(col("query_id") === col("doc_id")).count() == 0,
      "a query must not retrieve itself")
  }

  test("dup_stats histogram covers the whole corpus") {
    val total = run("q_x_dup_stats").agg(sum(col("n_docs"))).head().getLong(0)
    assert(total == Tables.table(spark, sfDir, "documents").count())
  }
}
