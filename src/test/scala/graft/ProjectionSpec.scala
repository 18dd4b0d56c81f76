package graft

import org.apache.spark.sql.functions._

import operators.Projection

/** JL random projection: deterministic sign matrix, exact per-value
  * agreement with a driver-side reference computation, and the JL
  * norm-preservation property (E[||Pv||²] = ||v||²) on the fixture.
  */
class ProjectionSpec extends SparkSuite {
  import spark.implicits._

  test("sign matrix is ±1, balanced-ish, and stable") {
    val s = Projection.jlSigns(64, 16)
    assert(s.length === 16 && s.forall(_.length === 64))
    assert(s.flatten.forall(x => x == 1.0 || x == -1.0))
    val pos = s.flatten.count(_ == 1.0)
    assert(pos > 380 && pos < 640, s"badly unbalanced: $pos of 1024 positive")
    // stable across calls (pure function of (i, j))
    assert(Projection.jlSigns(64, 16).map(_.toSeq).toSeq === s.map(_.toSeq).toSeq)
  }

  test("projected values match the driver-side reference exactly") {
    val emb = Tables.table(spark, sfDir, "embeddings").limit(5)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val signs = Projection.jlSigns(64, 16)
    val got = Projection.randomProject(
        Tables.table(spark, sfDir, "embeddings"), "embedding", "vec_id", 64, 16)
      .filter($"vec_id".isin(emb.map(_._1).toSeq: _*))
      .as[(Long, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    for ((id, v) <- emb; j <- 0 until 16) {
      // same fold order as graft_dot: left-to-right over i
      var acc = 0.0
      var i = 0
      while (i < 64) { acc += v(i).toDouble * signs(j)(i); i += 1 }
      val want = BigDecimal(acc * 0.25).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got((id, j)) - want) < 1e-9, s"vec $id coord $j")
    }
  }

  test("norm preservation on the fixture: corpus-average ratio near 1") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val orig = emb.select($"vec_id",
      functions.VectorFunctions.dot(
        functions.VectorFunctions.toDouble($"embedding"),
        functions.VectorFunctions.toDouble($"embedding")).as("n2"))
    val proj = Projection.randomProject(emb, "embedding", "vec_id", 64, 16)
      .groupBy($"vec_id").agg(sum($"p" * $"p").as("p2"))
    val ratio = proj.join(orig, "vec_id")
      // p_j = dot(v, s_j)/√16 ⇒ E[Σ_j p_j²] = 16·||v||²/16 = ||v||²
      .select(avg($"p2" / $"n2").as("r")).head().getDouble(0)
    assert(ratio > 0.85 && ratio < 1.15, s"avg norm ratio $ratio")
  }
}
