package graft.operators

import org.apache.spark.sql.DataFrame

/** Incremental view maintenance for inner equi-joins (the delta rule
  * of classic IVM, Blakeley et al. 1986): with a materialized state
  * A₀⋈B₀ and delta batches ΔA, ΔB, the refreshed view is
  *
  *   state ∪ (ΔA ⋈ B₀) ∪ (A₀ ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
  *
  * — three joins whose driving side is delta-sized, never a full
  * recompute. The join-view counterpart of [[IncrementalAgg]]'s
  * rollup maintenance: at 100 TB the state is a persisted (ideally
  * key-bucketed) table, each micro-batch pays |Δ|·lookup cost, and
  * because inner joins distribute over union the merged view is
  * EXACTLY (A₀∪ΔA) ⋈ (B₀∪ΔB) — the no-drift contract
  * q_x_incr_join's oracle (a full recompute in DuckDB) certifies.
  */
object IncrementalJoin {

  /** @param state the materialized A₀⋈B₀ (or the previous refresh).
    * @param keys  equi-join keys shared by both sides.
    */
  def refreshed(state: DataFrame, a0: DataFrame, da: DataFrame,
      b0: DataFrame, db: DataFrame, keys: Seq[String]): DataFrame =
    state
      .unionByName(da.join(b0, keys))
      .unionByName(a0.join(db, keys))
      .unionByName(da.join(db, keys))
}
