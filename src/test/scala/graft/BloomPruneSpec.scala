package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomPrune

class BloomPruneSpec extends SparkSuite {

  test("bloom-pruned semi join equals plain semi join on the fixture") {
    val li = Tables.table(spark, sfDir, "lineitem")
    val urgent = Tables.table(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val pruned = BloomPrune.semiJoin(li, urgent, "l_orderkey", "o_orderkey",
        expectedNumItems = 10000L)
      .select(col("l_orderkey"), col("l_linenumber"))
    val plain = li.join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"))
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    assert(pruned.count() > 0)
  }

  test("exactness holds even at a high false-positive rate") {
    val li = Tables.table(spark, sfDir, "lineitem")
    val urgent = Tables.table(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val sloppy = BloomPrune.semiJoin(li, urgent, "l_orderkey", "o_orderkey",
        expectedNumItems = 100L, fpp = 0.5)
      .select(col("l_orderkey"), col("l_linenumber"))
    val plain = li.join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"))
    assert(sloppy.exceptAll(plain).isEmpty && plain.exceptAll(sloppy).isEmpty)
  }

  test("pruneCol keeps every true key (no false negatives)") {
    val dim = spark.range(0, 50).toDF("k")
    val fact = spark.range(0, 1000).toDF("fk")
    val kept = fact.filter(BloomPrune.pruneCol(dim, "k", col("fk"), 50L, 0.03))
    // all 50 true keys survive; false positives allowed but bounded
    assert(kept.join(dim, col("fk") === col("k"), "left_semi").count() === 50)
    assert(kept.count() < 300)
  }
}
