package graft.operators

import org.apache.spark.sql.DataFrame

/** Partition width for CPU-bound-but-byte-light kernel stages — the
  * per-candidate-pair verify loops (levenshtein, set intersection,
  * dot products) whose per-row cost dwarfs their row size.
  *
  * Two mechanisms serialize such stages if left to defaults, both
  * size-based and therefore blind to compute cost:
  *
  *  - AQE coalesces post-shuffle partitions by DATA SIZE, so a few MB
  *    of candidate pairs pack into one task (measured r10: one 150 s
  *    intersect_count task in the sf1 evidence run while 31 cores sat
  *    idle — the Dedup.verifyWidth finding);
  *  - file scans split by BYTES (maxPartitionBytes), so a kernel
  *    fused into the scan stage of a small file runs at
  *    one-task-per-file parallelism (measured this round: the
  *    q_x_fuzzy levenshtein verify and the bruteForceKnn dot-product
  *    loop both ran on the single-split customer/embeddings scans).
  *
  * A user-specified repartition(n) is exempt from AQE coalescing
  * (AQE never overrides an explicit partition count), and the
  * shuffled bytes are candidate keys/payloads whose per-byte compute
  * cost amortizes the move at any scale — for an O(|pairs|·d) kernel
  * the shuffle moves each row once to buy cluster-wide parallelism on
  * work that is orders of magnitude heavier than the move.
  */
object VerifyWidth {
  def of(df: DataFrame): Int =
    math.max(df.sparkSession.sparkContext.defaultParallelism, 16)
}
