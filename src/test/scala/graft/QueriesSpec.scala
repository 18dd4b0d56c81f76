package graft

/** Smoke: every declared query runs on sf0.001 and yields rows (the
  * value-level check is the external DuckDB oracle — dev/check.py /
  * the driver's t2 gate).
  */
class QueriesSpec extends SparkSuite {

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows") {
      assert(fn(spark, sfDir).count() > 0)
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle entry has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
