package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components — the cluster-assignment step of a
  * near-duplicate pipeline (pairs from [[Dedup]] → one representative
  * per duplicate cluster).
  *
  * Algorithm: min-label propagation with pointer jumping. Each round
  * does (1) a neighbor-min over the edge list, then (2) a pointer jump
  * (label := label of label), so the label of a node reaches the
  * component minimum in O(log diameter) rounds on id-aligned chains
  * instead of O(diameter) — the property that makes this usable on
  * 100 TB-scale graphs (same round structure as GraphFrames/Pregel-
  * style CC, built from plain shuffles here). Measured caveat (r18):
  * the jump follows LABEL pointers, so its compression depends on ids
  * correlating with topology — on a filament whose ids are a random
  * permutation of the path order, rounds degrade toward O(n/3) (50-
  * node permuted path: 17 rounds; 100-node: > 21), where the aligned
  * 300-path needs 8. The fixture graphs converge in ≤ 10 rounds; a
  * corpus whose similarity filaments have id-random order would need
  * the O(log²) star-contraction algorithm instead — `maxIters` +
  * `require(converged)` keep that failure loud, never silent.
  *
  * Scale notes: each round is ONE edge-frame shuffle join + one
  * label-sized self-join (r18 shape — self-loop rows make the
  * neighbor-min aggregate total, removing the per-round label
  * join-back; the jump input is lineage-cut so the self-join reads
  * persisted blocks instead of re-executing the neighbor-min subtree
  * twice). Each round's plan is truncated via [[Checkpoints.truncate]]
  * (reliable checkpoint when opted in for cluster runs, localCheckpoint
  * otherwise) so Catalyst analysis cost stays O(1) in the round count
  * rather than compounding.
  */
object Components {

  /** Assign each node the minimum node id of its connected component.
    *
    * @param nodes one column `id` — any orderable type (long, string,
    *              ...); the id keeps its native type end-to-end, so
    *              string-id corpora are never silently nulled by a
    *              cast. Isolated nodes allowed (own cluster). Edge
    *              endpoints must be drawn from `nodes` (every caller
    *              derives edges from the node table).
    * @param edges columns `a`, `b`, same type as `id` — undirected;
    *              direction and duplicates are normalized internally.
    * @param jumpsPerRound pointer jumps folded into each round (≥ 1).
    *   Extra jumps deepen pointer compression per round at the cost of
    *   one more label-sized self-join each. Since r18 every jump input
    *   is lineage-cut, so chained jumps are ADDITIVE in executed work
    *   (the pre-r18 form re-executed the fold subtree ~2^j times; see
    *   dev/NOTES.md round-12 log). Measured r18 on the fixture's
    *   cos-0.4 graph: j=2 did NOT reduce the 10-round count (label
    *   pointers there don't form deep chains — see the id-random
    *   caveat above), so the default stays 1; the knob remains for
    *   graphs whose ids align with topology.
    * @return (id, cluster_id) — cluster_id = min id in the component
    *         under the type's natural ordering.
    */
  def connectedComponents(
      spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      maxIters: Int = 25, jumpsPerRound: Int = 1): DataFrame = {
    require(jumpsPerRound >= 1,
      s"jumpsPerRound must be >= 1 (got $jumpsPerRound): 0 would silently " +
        "disable pointer jumping, degrading convergence to O(diameter) rounds")
    // Materialize the (possibly expensive) edge derivation ONCE — both
    // the direction-normalizing union below and every loop round would
    // otherwise re-execute the upstream candidate-pair computation
    // (measured: 12.6 s → 2.5 s on the dup-clusters query).
    val e0 = edges.select(col("a").as("src"), col("b").as("dst"))
      .transform(Checkpoints.truncate(_))
    // Symmetrized edges PLUS one self-loop per node (r18): the
    // self-loop row makes the per-round neighbor-min aggregate TOTAL
    // over the node set — min(dlbl) over {self} ∪ N(id) covers every
    // node and already folds the node's own label in, so the round
    // needs no left-join back onto the previous label frame (one
    // whole join + its exchange removed from every round), and the
    // previous label rides out of the same aggregate as the self-loop
    // row's value (the convergence test needs it).
    val sym = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .union(nodes.select(col("id").as("src"), col("id").as("dst")))
      .transform(Checkpoints.truncate(_))

    // lbl(x) = min(x, direct neighbors) — the self-loop contributes x
    var lbl = sym
      .groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("lbl"))
      .transform(Checkpoints.truncate(_))

    // Dev-only per-round timing (graft.IterProbe sets the property):
    // each round ends in a real action, so construct-vs-action wall
    // time separates driver planning cost from execution cost.
    val probe = sys.props.get("graft.roundProbe").contains("true")
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val tRound0 = System.nanoTime()
      // (1) neighbor-min: pull each neighbor's current label; the
      // self-loop row pulls the node's own label, so min() includes it
      // and max(when(dst = src)) recovers it as `prev` for the
      // convergence test — no join back onto lbl.
      val afterEdges = sym
        .join(lbl.select(col("id").as("dst2"), col("lbl").as("dlbl")),
          col("dst") === col("dst2"))
        .groupBy(col("src").as("id"))
        .agg(min(col("dlbl")).as("lbl"),
          max(when(col("src") === col("dst"), col("dlbl"))).as("prev"))
        // cut BEFORE the jump: the self-join below references this
        // frame twice — uncut, the whole neighbor-min subtree appeared
        // twice in every round's plan (double planning) and executed
        // twice (two shuffle writes); cut, both references read the
        // same persisted blocks, materialized once by the round's
        // convergence count (same lazy-cut-in-one-action shape as the
        // round cut itself)
        .transform(Checkpoints.truncate(_, eager = false))
      // (2) pointer jump(s): lbl := lbl(lbl), jumpsPerRound times;
      // `prev` rides along so the convergence test below is a narrow
      // scan of the checkpointed result, not an extra shuffle join
      // against the old labels. Each jump result is itself lazily cut
      // so chained jumps stay additive (no in-round subtree doubling).
      // lazy checkpoint + count in ONE action: the full-scan convergence
      // count materializes the checkpoint blocks as it runs (an eager
      // checkpoint plus a separate isEmpty job was two actions per
      // round — pure scheduler latency at fixture scale; measured r6).
      val next = (1 to jumpsPerRound).foldLeft(afterEdges) {
          (cur, j) =>
            val jump = cur.select(col("id").as("jid"), col("lbl").as("jlbl"))
            val folded = cur.join(jump, col("lbl") === col("jid"), "left")
              .select(col("id"), col("prev"),
                least(col("lbl"), coalesce(col("jlbl"), col("lbl"))).as("lbl"))
            if (j < jumpsPerRound)
              folded.transform(Checkpoints.truncate(_, eager = false))
            else folded
        }
        .transform(Checkpoints.truncate(_, eager = false))
      val tBuilt = System.nanoTime()
      converged = next.filter(col("lbl") =!= col("prev")).count() == 0
      if (probe) println(f"[roundprobe] cc round=$iter%d " +
        f"build=${(tBuilt - tRound0) / 1e9}%.3f " +
        f"action=${(System.nanoTime() - tBuilt) / 1e9}%.3f")
      lbl = next.select(col("id"), col("lbl"))
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIters rounds")
    lbl.select(col("id"), col("lbl").as("cluster_id"))
  }
}
