package graft

import org.apache.spark.sql.functions._

/** graft_char_ngrams (codegen'd CharNgrams expression) must be
  * value-identical to the interpreted higher-order formulation
  * (transform/sequence/substring) for all inputs — including
  * multibyte text, where positions are CHARACTER positions (SQL
  * substring semantics), not byte offsets.
  */
class CharNgramsSpec extends SparkSuite {
  import spark.implicits._
  import functions.TextFunctions

  private def identical(n: Int, rows: Seq[String]): Unit = {
    val df = rows.toDF("text")
      .select(
        TextFunctions.charNgramsExpr("text", n).as("fast"),
        TextFunctions.charNgramsHigherOrder("text", n).as("ref"))
    assert(df.filter(!($"fast" <=> $"ref")).isEmpty)
  }

  test("edge cases: empty, short, exact-n, null (n=3)") {
    identical(3, Seq(
      "",          // 0 chars → empty array
      "ab",        // < n → empty array
      "abc",       // exactly n → 1 gram
      "abcd",      // n+1 → 2 grams
      "a b c",     // spaces are chars like any other
      null         // null in → null out (both forms)
    ))
  }

  test("multibyte: char positions, not byte offsets") {
    identical(3, Seq(
      "héllo wörld",   // 2-byte chars
      "日本語のテキスト",  // 3-byte chars
      "a💡b💡c",        // 4-byte surrogate-pair chars
      "é",             // single multibyte char < n
      "日本語"           // exactly n multibyte chars
    ))
  }

  test("edge cases across n = 1, 2, 5") {
    val texts = Seq("", "x", "abcdef", "äöü日本", null)
    Seq(1, 2, 5).foreach(n => identical(n, texts))
  }

  test("identical on the fixture documents corpus (n=3)") {
    val cmp = Tables.table(spark, sfDir, "documents")
      .select(
        TextFunctions.charNgramsExpr("text", 3).as("fast"),
        TextFunctions.charNgramsHigherOrder("text", 3).as("ref"))
    assert(cmp.filter(!($"fast" <=> $"ref")).isEmpty)
  }

  test("not deduplicated: repeated text keeps gram multiplicity") {
    val reps = Seq("aaaa").toDF("text")
      .select(TextFunctions.charNgramsExpr("text", 2).as("g"))
      .select(size($"g").as("n"), size(array_distinct($"g")).as("d"))
      .head()
    assert(reps.getInt(0) === 3 && reps.getInt(1) === 1)
  }

  test("shinglesExpr (array_distinct over char ngrams) unchanged semantics") {
    val got = Seq("abcabc").toDF("text")
      .select(TextFunctions.shinglesExpr("text", 3).as("s"))
      .head().getSeq[String](0)
    assert(got === Seq("abc", "bca", "cab"))
  }

  test("SQL registration: graft_char_ngrams requires a literal n") {
    val viaSql = spark.sql(
      "SELECT graft_char_ngrams('abcd', 2) AS g").head().getSeq[String](0)
    assert(viaSql === Seq("ab", "bc", "cd"))
    val err = intercept[Exception] {
      spark.sql("SELECT graft_char_ngrams('ab', cast(id AS int) + 2) FROM range(1)").collect()
    }
    assert(err.getMessage.contains("literal"))
  }
}
