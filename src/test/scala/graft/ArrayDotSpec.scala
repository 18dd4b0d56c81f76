package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** The codegen'd ArrayDotProduct must be bit-identical to the
  * interpreted higher-order formulation (which itself was verified
  * bit-identical to DuckDB's sequential list_sum).
  */
class ArrayDotSpec extends SparkSuite {
  import spark.implicits._

  test("graft_dot == higher-order dot, bit-exact, on all fixture vectors") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val a = emb.select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("ib"), $"embedding".as("vb"))
    val pairs = a.join(b, $"ia" % 7 === $"ib" % 7) // a spread of pairs
      .select(
        VectorFunctions.dot($"va", $"vb").as("fast"),
        VectorFunctions.dotHof($"va", $"vb").as("ref"))
    assert(pairs.filter($"fast" =!= $"ref").isEmpty)
    assert(pairs.count() > 1000)
  }

  test("graft_dot handles double arrays and mixed float/double") {
    val row = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(2.0, 0.5, 1.0)))
      .toDF("f", "d")
      .select(
        VectorFunctions.dot($"f", $"d").as("mixed"),
        VectorFunctions.dot($"d", $"d").as("dd"))
      .as[(Double, Double)].collect().head
    assert(row._1 === 1.0 * 2.0 + 2.0 * 0.5 + 3.0 * 1.0)
    assert(row._2 === 4.0 + 0.25 + 1.0)
  }

  test("graft_dot nulls out on null ELEMENTS, like the zip_with fold") {
    val out = Seq((Seq[java.lang.Float](1.0f, null, 3.0f), Seq[java.lang.Float](1.0f, 1.0f, 1.0f)))
      .toDF("a", "b")
      .select(VectorFunctions.dot($"a", $"b").as("fast"),
        VectorFunctions.dotHof($"a", $"b").as("ref"))
      .collect().head
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("graft_dot is null-safe") {
    val out = Seq((Some(Seq(1.0f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
      .select(VectorFunctions.dot($"a", $"b").as("d"))
      .collect().head
    assert(out.isNullAt(0))
  }
}
