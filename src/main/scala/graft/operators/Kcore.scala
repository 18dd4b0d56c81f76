package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-core extraction by iterative peeling (Seidman 1983; the
  * distributed formulation of Montresor et al. 2013): repeatedly drop
  * vertices whose degree in the SURVIVING subgraph is < k until none
  * remain. The k-core is order-independent (a unique maximal
  * subgraph), so the result is a pure function of the edge set at any
  * parallelism — KcoreSpec asserts equality with a sequential
  * reference peeler.
  *
  * On the near-dup graph the k-core is the "dense nucleus" audit:
  * triangles (q_x_triangles) certify local cliquishness, connected
  * components certify reachability, and the k-core isolates the
  * subgraph where EVERY member has ≥ k near-neighbors — template
  * farms and boilerplate families, the structures worth manual review
  * before a dedup pass deletes them.
  *
  * Scale shape: each round is one degree aggregation + one semi-join
  * on the surviving edge list — key-partitioned shuffles only, edge
  * list monotonically shrinking. Round count is bounded by the
  * degeneracy ordering depth (tiny on similarity graphs); each
  * round's frame is lineage-truncated via [[Checkpoints]] so plans
  * don't grow with iterations (the Components discipline).
  */
object Kcore {

  /** Vertices of the k-core with their within-core degree.
    * @param edges undirected (a, b), a < b, deduplicated.
    * @return (id, core_deg) — empty if the k-core is empty.
    */
  def kCore(spark: SparkSession, edges: DataFrame, k: Int,
      maxRounds: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def degOf(g: DataFrame): DataFrame =
      g.select(col("a").as("id"))
        .unionAll(g.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("core_deg"))
    def peel(g: DataFrame, deg: DataFrame): DataFrame = {
      val alive = deg.filter(col("core_deg") >= k).select(col("id"))
      g.join(alive.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("id").as("b")), Seq("b"), "left_semi")
    }
    var e = Checkpoints.truncate(edges.select(col("a"), col("b")), eager = false)
    var lastDeg: DataFrame = null
    var round = 0
    var stable = false
    while (!stable && round < maxRounds) {
      // TWO peel steps per driver action: peeling past the fixpoint is
      // idempotent, and the per-round count job (not the shuffle work)
      // dominated wall time at small partitions — one count now pays
      // for two peeling levels
      val e1 = Checkpoints.truncate(peel(e, degOf(e)), eager = false)
      val deg2 = Checkpoints.truncate(degOf(e1), eager = false)
      val nBelow = deg2.filter(col("core_deg") < k).count()
      lastDeg = deg2
      if (nBelow == 0L) stable = true
      else {
        e = Checkpoints.truncate(peel(e1, deg2), eager = false)
        round += 1
      }
    }
    // after convergence every surviving vertex has core_deg >= k;
    // if the loop emptied the graph, lastDeg's filter returns nothing
    lastDeg.filter(col("core_deg") >= k)
  }
}
