package graft

import org.apache.spark.sql.functions._

/** KMV bottom-k sketch invariants (functions.KmvSketch):
  * order/partitioning-independence (the determinism q_x_kmv_overlap's
  * oracle relies on), duplicate collapse, merge correctness, and the
  * Jaccard estimator's accuracy on sets with known overlap.
  */
class KmvSketchSpec extends SparkSuite {
  import spark.implicits._

  private val k = 64

  private def sketch(values: Seq[String], partitions: Int): Seq[String] = {
    spark.createDataset(values).repartition(partitions)
      .toDF("v").select(md5(col("v")).as("h"))
      .agg(call_function("graft_kmv", col("h"), lit(k)).as("ks"))
      .as[Seq[String]].head()
  }

  test("sketch is a pure set function: partitioning, order, dups irrelevant") {
    val base = (0 until 500).map(i => s"item$i")
    val shuffled = scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).shuffle(base ++ base.take(200)) // dups too
    val a = sketch(base, 1)
    val b = sketch(shuffled, 13)
    assert(a === b)
    // reference: the k lexicographically-smallest distinct md5 strings
    val expect = base.map(s => java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .distinct.sorted.take(k)
    assert(a === expect)
  }

  test("small input: sketch is the full sorted distinct hash set") {
    val got = sketch(Seq("a", "b", "a", "c"), 3)
    assert(got.length === 3 && got === got.sorted)
  }

  test("Jaccard estimator within sampling error at known overlap") {
    // two sets with exact J = 1000 / 3000 = 1/3
    val common = (0 until 1000).map(i => s"c$i")
    val ka = sketch(common ++ (0 until 1000).map(i => s"a$i"), 4)
    val kb = sketch(common ++ (0 until 1000).map(i => s"b$i"), 4)
    val merged = (ka ++ kb).distinct.sorted.take(k)
    val est = merged.count(h => ka.contains(h) && kb.contains(h)).toDouble /
      math.min(k, merged.length)
    // σ ≈ sqrt(J(1−J)/k) ≈ 0.059 at k=64 — allow 3σ
    assert(math.abs(est - 1.0 / 3.0) < 0.18, s"est=$est")
  }
}
