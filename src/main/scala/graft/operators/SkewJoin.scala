package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join by key salting (SURVEY.md "salting for
  * skew"; complements AQE's runtime skew-join splitting for the cases
  * AQE can't fix — e.g. a single hot key inside one partition of a
  * stateful op, or joins under disabled/ineffective AQE).
  *
  * The skewed (large) side gets a uniform random-free salt derived
  * from a stable row expression; the build side is replicated
  * saltFactor ways. Result is identical to the plain join — asserted
  * by spec — while the hot key's rows spread over saltFactor reducers.
  */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `key`, spreading each of big's
    * keys over `saltFactor` partitions. `saltExpr` must be a
    * deterministic expression over big's columns (e.g. a row id hash)
    * so replays produce identical partitioning.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, saltExpr: Column): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(saltExpr, lit(saltFactor)))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }
}
