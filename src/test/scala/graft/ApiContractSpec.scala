package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Components, RangeJoin}
import graft.plans.AsOf

/** Misuse must fail fast with a clear message — not return wrong
  * results (the operator contracts a library consumer relies on).
  */
class ApiContractSpec extends SparkSuite {
  import spark.implicits._

  test("as-of join rejects mismatched key types") {
    val left = Seq((1L, new java.sql.Timestamp(1000))).toDF("k", "ts")
    val right = Seq(("1", new java.sql.Timestamp(500), "x")).toDF("rk", "rts", "tag")
    val e = intercept[Exception] {
      AsOf.join(spark, left, right, "k", "ts", "rk", "rts").collect()
    }
    assert(e.getMessage.contains("as-of key types differ"), e.getMessage)
  }

  test("as-of join rejects a non-temporal ts column") {
    val left = Seq((1L, "notatime")).toDF("k", "ts")
    val right = Seq((1L, "alsonot", "x")).toDF("rk", "rts", "tag")
    val e = intercept[Exception] {
      AsOf.join(spark, left, right, "k", "ts", "rk", "rts").collect()
    }
    assert(e.getMessage.contains("must be TIMESTAMP or BIGINT"), e.getMessage)
  }

  test("as-of join rejects an unknown direction") {
    val df = Seq((1L, new java.sql.Timestamp(0))).toDF("k", "ts")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(spark, df, df.toDF("rk", "rts"), "k", "ts", "rk", "rts",
        direction = "nearest")
    }
    assert(e.getMessage.contains("backward|forward"), e.getMessage)
  }

  test("range join rejects a non-positive bin width") {
    val pts = Seq((1L, 1.0)).toDF("pid", "v")
    val iv = Seq((1L, 0.0, 2.0)).toDF("iid", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.binned(pts, iv, "v", "lo", "hi", binWidth = 0.0)
    }
    assert(e.getMessage.contains("binWidth"), e.getMessage)
  }

  test("freq_items and ngram expressions reject non-positive size parameters") {
    val e1 = intercept[Exception] { functions.FreqItems(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), k = 0) }
    assert(e1.getMessage.contains("positive"))
    val e2 = intercept[Exception] { functions.CharNgrams(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), n = 0) }
    assert(e2.getMessage.contains("positive"))
  }

  test("connected components reports non-convergence instead of partial labels") {
    val nodes = (0L to 9L).toDF("id")
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Components.connectedComponents(spark, nodes, edges, maxIters = 1)
    }
    assert(e.getMessage.contains("did not converge"), e.getMessage)
  }
}
