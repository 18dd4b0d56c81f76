package graft

import graft.operators.Profiling

class ProfilingSpec extends SparkSuite {
  import spark.implicits._

  test("columnProfile: nulls, exact distincts, native-type min/max per column") {
    val df = Seq(
      (1L, Option("a"), Option(2.5)),
      (2L, None, Option(10.0)),
      (3L, Option("b"), None),
      (3L, Option("b"), Option(2.5))
    ).toDF("id", "name", "score")
    val p = Profiling.columnProfile(df).collect()
      .map(r => r.getString(0) -> r).toMap

    assert(p.keySet === Set("id", "name", "score"))
    val id = p("id")
    assert((id.getString(1), id.getLong(2), id.getLong(3), id.getLong(4)) === (("bigint", 4L, 0L, 3L)))
    assert((id.getString(5), id.getString(6)) === (("1", "3")))
    val name = p("name")
    assert((name.getLong(3), name.getLong(4), name.getString(5), name.getString(6)) ===
      ((1L, 2L, "a", "b")))
    // min/max computed on the NATIVE type: 2.5 < 10.0 numerically even
    // though "10.0" < "2.5" as strings
    val score = p("score")
    assert((score.getString(5), score.getString(6)) === (("2.5", "10.0")))
  }

  test("empty frame: zero counts, null min/max, no errors") {
    val p = Profiling.columnProfile(Seq.empty[(Long, String)].toDF("id", "name"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("id").getLong(2) === 0L)     // n_rows
    assert(p("id").getLong(3) === 0L)     // n_nulls coalesced, not NULL
    assert(p("id").getLong(4) === 0L)     // n_distinct
    assert(p("id").isNullAt(5) && p("id").isNullAt(6))
  }

  test("dotted column names profile as columns, not nested-field paths") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("a.b", "name")
    val p = Profiling.columnProfile(df).collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("a.b", "name"))
    assert(p("a.b").getLong(4) === 2L) // n_distinct
  }

  test("duplicate column names are rejected with a clear message") {
    val df = Seq((1, 2)).toDF("x", "x")
    val ex = intercept[IllegalArgumentException](Profiling.columnProfile(df))
    assert(ex.getMessage.contains("duplicate column names"))
  }

  test("zero-column frame is rejected") {
    intercept[IllegalArgumentException] {
      Profiling.columnProfile(spark.range(3).drop("id"))
    }
  }
}
