package graft

import org.apache.spark.sql.functions._

/** graft_intersect_count must equal size(array_intersect(a, b)) for
  * all inputs, including duplicate elements and nulls-in-arrays.
  */
class ArrayIntersectCountSpec extends SparkSuite {
  import spark.implicits._

  test("equals size(array_intersect) incl. duplicates and disjoint sets") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("a", "b", "b")),   // duplicates both sides
      (Seq("x"), Seq("y")),                       // disjoint
      (Seq.empty[String], Seq("a")),              // empty left
      (Seq("a", "b"), Seq.empty[String])          // empty right
    ).toDF("a", "b")
      .unionByName(Seq((Seq("a", null), Seq(null.asInstanceOf[String], "b")))
        .toDF("a", "b"))                          // shared null element
      .select(
        call_function("graft_intersect_count", $"a", $"b").as("fast"),
        size(array_intersect($"a", $"b")).as("ref"))
    assert(df.filter($"fast" =!= $"ref").isEmpty)
  }

  test("equals size(array_intersect) on fixture shingle pairs") {
    val sh = Tables.table(spark, sfDir, "documents")
      .select($"doc_id", functions.TextFunctions.shinglesExpr("text", 3).as("s"))
    val a = sh.select($"doc_id".as("da"), $"s".as("sa"))
    val b = sh.select($"doc_id".as("db"), $"s".as("sb"))
    val cmp = a.join(b, $"da" + 1 === $"db")
      .select(
        call_function("graft_intersect_count", $"sa", $"sb").as("fast"),
        size(array_intersect($"sa", $"sb")).as("ref"))
    assert(cmp.filter($"fast" =!= $"ref").isEmpty)
    assert(cmp.count() === 499)
  }
}
