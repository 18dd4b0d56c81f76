package graft

import org.apache.spark.sql.functions._

import graft.functions.JaroWinklerSim
import org.apache.spark.unsafe.types.UTF8String

/** Pins graft_jaro_winkler bit-exactly to DuckDB's
  * jaro_winkler_similarity: the published worked examples, the empty
  * and zero-match conventions, the 0.7 boost threshold, the 4-char
  * prefix cap, and the odd-transposition FLOOR — every constant below
  * was computed by DuckDB on these inputs.
  */
class JaroWinklerSpec extends SparkSuite {

  private def jw(a: String, b: String): Double =
    JaroWinklerSim.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("worked examples and conventions match DuckDB-computed constants") {
    val cases = Seq(
      ("martha", "marhta") -> 0.9611111111111111, // classic; prefix 3
      ("dixon", "dicksonx") -> 0.8133333333333332, // boost over 0.7
      ("abcdef", "abzzzz") -> 0.5555555555555555, // jaro <= 0.7: NO boost
      ("crate", "trace") -> 0.7333333333333334, // prefix 0: no boost
      ("ab", "") -> 0.0, // empty side
      ("", "") -> 0.0, // DuckDB's both-empty convention
      ("a", "a") -> 1.0,
      ("ab", "ba") -> 0.0, // window 0: no matches
      ("abcdefgh", "hgfedcba") -> 0.5,
      ("aaaaab", "aaaaac") -> 0.9333333333333333, // prefix CAPPED at 4
      ("ab", "abcdefghijklmnop") -> 0.7666666666666667,
      ("abcdef", "bcadef") -> 0.9444444444444445) // odd t=3 FLOORS to 1
    cases.foreach { case ((a, b), expect) =>
      assert(math.abs(jw(a, b) - expect) < 1e-15, s"jw($a, $b)")
      assert(math.abs(jw(b, a) - expect) < 1e-15, s"symmetric jw($b, $a)")
    }
  }

  test("codegen and interpreted paths agree on fixture names") {
    import spark.implicits._
    val names = Tables.table(spark, sfDir, "customer")
      .select(col("c_name")).as[String].take(50)
    val pairs = names.zip(names.drop(1)).toSeq.toDF("a", "b")
    val viaExpr = pairs
      .select(call_function("graft_jaro_winkler", col("a"), col("b")).as("jw"))
      .as[Double].collect()
    val direct = names.zip(names.drop(1)).map { case (a, b) => jw(a, b) }
    viaExpr.zip(direct).foreach { case (x, y) => assert(x == y, "codegen parity") }
  }

  test("range and identity invariants") {
    val names = Seq("alpha", "beta", "gamma", "delta", "alphabet", "alpa")
    for (a <- names; b <- names) {
      val v = jw(a, b)
      assert(v >= 0.0 && v <= 1.0)
      if (a == b) assert(v == 1.0)
    }
  }
}
