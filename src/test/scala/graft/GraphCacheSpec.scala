package graft

import org.apache.spark.sql.Row

import graft.operators.{CosGraph, DupGraph}

/** Bench-time edge-cache semantics (DupGraph / CosGraph): caching off
  * (the Verify default) builds fresh standalone plans; caching on
  * serves ONE frame per (dir, threshold); cached and uncached results
  * are identical. Resets state in finally so the shared test session
  * never leaks bench behavior into other suites.
  */
class GraphCacheSpec extends SparkSuite {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Row] =
    df.collect().toSet

  test("CosGraph: off = fresh plans, on = one frame per key, results equal") {
    CosGraph.reset()
    val fresh1 = CosGraph.pairs(spark, sfDir, 0.35)
    val fresh2 = CosGraph.pairs(spark, sfDir, 0.35)
    assert(fresh1 ne fresh2, "caching off must build standalone plans")
    val want = rows(fresh1)
    CosGraph.enableCaching()
    try {
      val c1 = CosGraph.pairs(spark, sfDir, 0.35)
      val c2 = CosGraph.pairs(spark, sfDir, 0.35)
      assert(c1 eq c2, "caching on must serve one frame per (dir, threshold)")
      assert(CosGraph.pairs(spark, sfDir, 0.45) ne c1,
        "different threshold must be a different cache entry")
      assert(rows(c1) == want, "cached result must equal the uncached one")
    } finally CosGraph.reset()
    assert(CosGraph.pairs(spark, sfDir, 0.35) ne fresh1)
  }

  test("DupGraph: same contract on the shingle modality") {
    DupGraph.reset()
    val fresh = DupGraph.pairs(spark, sfDir, 0.7)
    val want = rows(fresh)
    DupGraph.enableCaching()
    try {
      val c1 = DupGraph.pairs(spark, sfDir, 0.7)
      assert(c1 eq DupGraph.pairs(spark, sfDir, 0.7))
      assert(rows(c1) == want)
    } finally DupGraph.reset()
  }

  test("DupGraph.clusters: same contract at the CC level (r17 grain)") {
    DupGraph.reset()
    val fresh1 = DupGraph.clusters(spark, sfDir, 0.7)
    val fresh2 = DupGraph.clusters(spark, sfDir, 0.7)
    assert(fresh1 ne fresh2, "caching off must build standalone CC plans")
    val want = rows(fresh1)
    assert(want.nonEmpty, "every doc is a CC node — frame must cover the corpus")
    DupGraph.enableCaching()
    try {
      val c1 = DupGraph.clusters(spark, sfDir, 0.7)
      assert(c1 eq DupGraph.clusters(spark, sfDir, 0.7),
        "caching on must serve one cluster frame per (dir, threshold)")
      assert(rows(c1) == want, "cached CC assignment must equal the uncached one")
    } finally DupGraph.reset()
  }
}
