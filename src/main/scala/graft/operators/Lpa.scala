package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan, Albert & Kumara 2007) —
  * community detection on the near-dup/similarity graph. Where
  * [[Components.connectedComponents]] answers "what is transitively
  * linked at all" (the dedup-keep universe), LPA splits a component
  * into DENSELY-linked communities: template families inside one
  * loosely-bridged cluster, topic groups in a citation graph.
  *
  * Determinism (the published algorithm is randomized; this variant
  * is not): synchronous rounds, every vertex adopts the most frequent
  * label among its NEIGHBORS, ties broken by smallest label, isolated
  * or degree-0 vertices keep their own id. A fixed round budget
  * bounds oscillation (classic for synchronous LPA on bipartite-ish
  * structures) — the spec pins convergence behavior on fixtures.
  *
  * Scale shape: each round is one join of the edge list against the
  * label table + one (vertex, label) count aggregate + one per-vertex
  * argmax window — all partitioned by vertex id, nothing global.
  * Lineage is cut per round ([[Checkpoints.truncate]]), the same
  * iterative-loop discipline as Components/PageRank/Kcore.
  */
object Lpa {

  /** @param nodes one column `id` (any orderable type)
    * @param edges columns `a`, `b`, same type — undirected, normalized
    *              internally
    * @return (id, community) — community = the converged label (a
    *         vertex id, NOT guaranteed to be the community minimum)
    */
  def communities(
      spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      rounds: Int = 8): DataFrame = {
    val e0 = edges.select(col("a").as("src"), col("b").as("dst"))
      .transform(Checkpoints.truncate(_))
    val sym = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .transform(Checkpoints.truncate(_))

    var labels = nodes.select(col("id"), col("id").as("lbl"))
      .transform(Checkpoints.truncate(_))
    var round = 0
    while (round < rounds) {
      // Neighbor messages at weight 1, PLUS one weight-0 self-message
      // per vertex (r18): the self row guarantees every vertex
      // surfaces from the count aggregate — carrying its CURRENT label
      // as the c=0 fallback the argmax picks only when no neighbor
      // message exists — so the round needs no join back onto the
      // label frame ("keep own label" left-join removed: one fewer
      // shuffle join per round at any scale). Weight 0 keeps counts
      // and tie-breaks bit-identical to the neighbor-only form: a
      // label group holding only the self row sums to 0 and loses to
      // any real neighbor label (c ≥ 1); a self label that neighbors
      // also carry gets +0 — unchanged.
      val msgs = sym
        .join(labels.select(col("id").as("src"), col("lbl")), "src")
        .select(col("dst").as("id"), col("lbl"), lit(1L).as("wt"))
        .unionAll(labels.select(col("id"), col("lbl"), lit(0L).as("wt")))
      val counts = msgs.groupBy(col("id"), col("lbl")).agg(sum(col("wt")).as("c"))
      val w = Window.partitionBy(col("id")).orderBy(col("c").desc, col("lbl"))
      // lazy cut: the loop has no per-round action (fixed round
      // budget, no convergence check), so an EAGER cut here ran one
      // materialization job per round — pure scheduler latency at
      // fixture scale (the PageRank/Kcore lazy-cut discipline; all 8
      // rounds now materialize under the caller's single action)
      labels = counts
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("id"), col("lbl"))
        .transform(Checkpoints.truncate(_, eager = false))
      round += 1
    }
    labels.select(col("id"), col("lbl").as("community"))
  }
}
