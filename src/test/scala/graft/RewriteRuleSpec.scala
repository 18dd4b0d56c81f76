package graft

import org.apache.spark.sql.functions._

import graft.functions.ArrayIntersectCount

/** The optimizer rule must rewrite plain-SQL size(array_intersect)
  * to the codegen'd count — same results, no intersection array.
  */
class RewriteRuleSpec extends SparkSuite {
  import spark.implicits._

  test("size(array_intersect) in ad-hoc SQL is rewritten and result-identical") {
    val df = Sql.adhoc(spark, sfDir,
      """SELECT doc_id,
                size(array_intersect(split(text, ' '), array('the', 'a', 'data'))) AS hits
         FROM documents ORDER BY doc_id""")
    val rewritten = df.queryExecution.optimizedPlan.expressions.exists(
      _.exists(_.isInstanceOf[ArrayIntersectCount])) ||
      df.queryExecution.optimizedPlan.toString.contains("graftintersectcount") ||
      df.queryExecution.executedPlan.toString.contains("graft")
    // expression-level check on the optimized plan tree:
    val found = df.queryExecution.optimizedPlan.collect {
      case p if p.expressions.exists(_.exists(_.isInstanceOf[ArrayIntersectCount])) => p
    }
    assert(found.nonEmpty || rewritten, "rewrite did not fire")

    // results identical to the unrewritten semantics
    val expected = Tables.table(spark, sfDir, "documents")
      .select($"doc_id",
        size(array_intersect(split($"text", " "), array(lit("the"), lit("a"), lit("data"))))
          .as("hits"))
      .orderBy($"doc_id")
    assert(df.except(expected).isEmpty && expected.except(df).isEmpty)
  }

  test("rewrite leaves non-string arrays alone") {
    val df = Sql.adhoc(spark, sfDir,
      "SELECT size(array_intersect(array(1,2,3), array(2,3,4))) AS n")
    assert(df.collect().head.getInt(0) === 2)
    val found = df.queryExecution.optimizedPlan.collect {
      case p if p.expressions.exists(_.exists(_.isInstanceOf[ArrayIntersectCount])) => p
    }
    assert(found.isEmpty)
  }
}
