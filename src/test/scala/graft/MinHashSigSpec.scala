package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The codegen'd MinHash signature must be bit-identical to the
  * higher-order xxhash64 formulation on real data.
  */
class MinHashSigSpec extends SparkSuite {
  import spark.implicits._

  test("graft_minhash == higher-order formulation on all fixture docs") {
    val words = Tables.table(spark, sfDir, "documents")
      .select(array_distinct(split($"text", " ")).as("w"))
    val cmp = words.select(
      Dedup.minhashSignature($"w", 32).as("fast"),
      Dedup.minhashSignatureHof($"w", 32).as("ref"))
    assert(cmp.filter($"fast" =!= $"ref").isEmpty)
    assert(cmp.count() === 500)
  }

  test("signature is stable and k-long; empty array yields MaxValue fill") {
    val out = Seq(Seq("a", "b"), Seq.empty[String]).toDF("w")
      .select(Dedup.minhashSignature($"w", 4).as("sig"))
      .as[Seq[Long]].collect()
    assert(out(0).size === 4)
    assert(out(1) === Seq.fill(4)(Long.MaxValue))
    val again = Seq(Seq("a", "b")).toDF("w")
      .select(Dedup.minhashSignature($"w", 4).as("sig"))
      .as[Seq[Long]].collect().head
    assert(out(0) === again)
  }
}
