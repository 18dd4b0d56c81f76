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
  * component minimum in O(log diameter) rounds instead of
  * O(diameter) — the property that makes this usable on 100 TB-scale
  * graphs (same round structure as GraphFrames/Pregel-style CC, built
  * from plain shuffles here).
  *
  * Scale notes: each round is two hash-shuffle joins on the label key
  * (no cross join, no driver-side adjacency); each round's plan is
  * truncated via [[Checkpoints.truncate]] (reliable checkpoint when
  * opted in for cluster runs, localCheckpoint otherwise) so Catalyst
  * analysis cost stays O(1) in the round count rather than compounding.
  */
object Components {

  /** Assign each node the minimum node id of its connected component.
    *
    * @param nodes one column `id` — any orderable type (long, string,
    *              ...); the id keeps its native type end-to-end, so
    *              string-id corpora are never silently nulled by a
    *              cast. Isolated nodes allowed (own cluster).
    * @param edges columns `a`, `b`, same type as `id` — undirected;
    *              direction and duplicates are normalized internally.
    * @param jumpsPerRound pointer jumps folded into each round (≥ 1).
    *   Extra jumps shorten the round count on long-filament graphs
    *   (each jump doubles pointer depth) at the cost of a larger
    *   per-round plan — the driver-planning vs round-count tradeoff
    *   measured by graft.IterProbe; see dev/NOTES.md round-12 log.
    *   NOTE each extra jump self-joins the previous fold frame with no
    *   mid-round lineage cut, so EXECUTED work grows ~2^j per round,
    *   not additively (measured: minutes vs seconds at jumps=2/3 on
    *   60-node filaments) — IterProbe slopes at jumps ≥ 2 conflate
    *   planning with duplicated execution.
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
    val sym = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .transform(Checkpoints.truncate(_))

    // lbl(x) = min(x, direct neighbors)
    var lbl = nodes.select(col("id"))
      .join(sym, col("id") === col("src"), "left")
      .groupBy(col("id"))
      .agg(least(min(col("dst")), first(col("id"))).as("lbl"))
      .transform(Checkpoints.truncate(_))

    // Dev-only per-round timing (graft.IterProbe sets the property):
    // each round ends in a real action, so construct-vs-action wall
    // time separates driver planning cost from execution cost.
    val probe = sys.props.get("graft.roundProbe").contains("true")
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val tRound0 = System.nanoTime()
      // (1) neighbor-min: pull each neighbor's current label
      val viaEdges = sym
        .join(lbl.select(col("id").as("dst2"), col("lbl").as("dlbl")),
          col("dst") === col("dst2"))
        .groupBy(col("src").as("id"))
        .agg(min(col("dlbl")).as("nlbl"))
      val afterEdges = lbl.join(viaEdges, Seq("id"), "left")
        .select(col("id"), col("lbl").as("prev"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl1"))
      // (2) pointer jump(s): lbl := lbl(lbl), jumpsPerRound times;
      // `prev` rides along so the convergence test below is a narrow
      // scan of the checkpointed result, not an extra shuffle join
      // against the old labels. Each extra jump self-joins the
      // previous frame (referenced twice → in-round subtree doubling,
      // bounded because every round starts from RDD scans).
      // lazy checkpoint + count in ONE action: the full-scan convergence
      // count materializes the checkpoint blocks as it runs (an eager
      // checkpoint plus a separate isEmpty job was two actions per
      // round — pure scheduler latency at fixture scale; measured r6).
      val next = (1 to jumpsPerRound).foldLeft(
          afterEdges.select(col("id"), col("prev"), col("lbl1").as("lbl"))) {
          (cur, _) =>
            val jump = cur.select(col("id").as("jid"), col("lbl").as("jlbl"))
            cur.join(jump, col("lbl") === col("jid"), "left")
              .select(col("id"), col("prev"),
                least(col("lbl"), coalesce(col("jlbl"), col("lbl"))).as("lbl"))
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
