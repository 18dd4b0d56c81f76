package graft

import org.apache.spark.sql.functions._

/** graft_word_ngrams (codegen'd WordNgrams expression) must be
  * value-identical to the interpreted higher-order formulation
  * (transform/sequence/slice over split) for all inputs — including
  * the edge cases the expression's doc comment claims: empty string,
  * fewer words than n, trailing/leading/repeated separators, null.
  */
class WordNgramsSpec extends SparkSuite {
  import spark.implicits._
  import functions.TextFunctions

  private def identical(n: Int, rows: Seq[String]): Unit = {
    val df = rows.toDF("text")
      .select(
        TextFunctions.wordNgramsExpr("text", n).as("fast"),
        TextFunctions.wordNgramsHigherOrder("text", n).as("ref"))
    assert(df.filter(!($"fast" <=> $"ref")).isEmpty)
  }

  test("edge cases: empty, short, separators, null (n=3)") {
    identical(3, Seq(
      "",                    // split('', ' ') = [''] → 1 word < 3 → empty
      "one",                 // 1 word
      "one two",             // 2 words
      "one two three",       // exactly n → 1 gram
      "one two three four",  // n+1 → 2 grams
      "a b ",                // trailing separator → empty final token
      " a b",                // leading separator → empty first token
      "a  b c",              // repeated separator → empty middle token
      "   ",                 // only separators
      null                   // null in → null out (both forms)
    ))
  }

  test("edge cases across n = 1, 2, 5") {
    val texts = Seq("", "w", "a b c d e f", "x  y ", null)
    Seq(1, 2, 5).foreach(n => identical(n, texts))
  }

  test("identical on the fixture documents corpus (n=3)") {
    val cmp = Tables.table(spark, sfDir, "documents")
      .select(
        TextFunctions.wordNgramsExpr("text", 3).as("fast"),
        TextFunctions.wordNgramsHigherOrder("text", 3).as("ref"))
    assert(cmp.filter(!($"fast" <=> $"ref")).isEmpty)
  }

  test("not deduplicated: repeated text keeps gram multiplicity") {
    val reps = Seq("go go go go").toDF("text")
      .select(TextFunctions.wordNgramsExpr("text", 2).as("g"))
      .select(size($"g").as("n"), size(array_distinct($"g")).as("d"))
      .head()
    assert(reps.getInt(0) === 3 && reps.getInt(1) === 1)
  }

  test("SQL registration: graft_word_ngrams requires a literal n") {
    val viaSql = spark.sql(
      "SELECT graft_word_ngrams('a b c d', 2) AS g").head().getSeq[String](0)
    assert(viaSql === Seq("a b", "b c", "c d"))
    val err = intercept[Exception] {
      // id is non-foldable: the loop bound must be known at plan time
      spark.sql("SELECT graft_word_ngrams('a b', cast(id AS int) + 2) FROM range(1)").collect()
    }
    assert(err.getMessage.contains("literal"))
  }
}
