package graft

import org.apache.spark.sql.functions._

import graft.operators.Triangles

/** Triangle counting (operators.Triangles) vs driver-side brute force
  * on graphs with known structure — including the skewed-hub case the
  * degree-ordered orientation exists for.
  */
class TrianglesSpec extends SparkSuite {
  import spark.implicits._

  private def bruteTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      a <- nodes; b <- nodes if a < b && es((a, b))
      c <- nodes if b < c && es((b, c)) && es((a, c))
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    counts.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perVertex(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  test("clique K5: every vertex in C(4,2)=6 triangles") {
    val k5 = for (a <- 0L until 5L; b <- (a + 1) until 5L) yield (a, b)
    val got = run(k5)
    assert(got === (0L until 5L).map(_ -> 6L).toMap)
  }

  test("star hub (the skew case) has zero triangles") {
    val star = (1L to 40L).map(i => (0L, i))
    assert(run(star).isEmpty)
  }

  test("random graph matches brute force") {
    val rnd = new scala.util.Random(42)
    val edges = (for {
      a <- 0L until 30L; b <- (a + 1) until 30L if rnd.nextDouble() < 0.25
    } yield (a, b)).toSeq
    assert(run(edges) === bruteTriangles(edges))
  }

  test("triangle list is each triangle once, orientation-ordered") {
    // triangle 0-1-2 plus pendant edge — exactly one output row
    val tri = Triangles.triangles(
      Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L)).toDF("a", "b"))
      .as[(Long, Long, Long)].collect()
    assert(tri.length === 1)
    assert(Set(tri.head._1, tri.head._2, tri.head._3) === Set(0L, 1L, 2L))
  }
}
