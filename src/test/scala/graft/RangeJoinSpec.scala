package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  test("binned range join == naive range join on random intervals") {
    val rnd = new scala.util.Random(13)
    val points = Seq.tabulate(400)(i => (i.toLong, rnd.nextDouble() * 1000))
      .toDF("pid", "v")
    val intervals = Seq.tabulate(40) { i =>
      val lo = rnd.nextDouble() * 950
      (i.toLong, lo, lo + rnd.nextDouble() * 120) // spans up to ~2.4 bins at w=50
    }.toDF("iid", "lo", "hi")
    val binned = RangeJoin.binned(points, intervals, "v", "lo", "hi", binWidth = 50.0)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, $"v" >= $"lo" && $"v" < $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(binned === naive)
    assert(naive.nonEmpty)
  }

  test("edge cases: bin-aligned bounds, empty interval, hi exclusive") {
    val points = Seq((1L, 100.0), (2L, 149.9), (3L, 150.0), (4L, 50.0))
      .toDF("pid", "v")
    val intervals = Seq(
      (10L, 100.0, 150.0), // [100,150): bin-aligned at w=50
      (11L, 120.0, 120.0)) // empty
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.binned(points, intervals, "v", "lo", "hi", binWidth = 50.0)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (2L, 10L))) // 150.0 excluded, 50.0 below lo
  }

  test("inverted intervals are dropped, not exploded into a descending bin range") {
    val points = Seq((1L, 5.0)).toDF("pid", "v")
    val intervals = Seq((9L, 1e9, 0.0), (10L, 0.0, 10.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.binned(points, intervals, "v", "lo", "hi", binWidth = 10.0)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L)))
  }

  test("plan is a shuffle equi-join, not a nested loop") {
    val points = spark.range(1000).select($"id".cast("double").as("v"), $"id".as("pid"))
    val intervals = spark.range(100)
      .select($"id".as("iid"), ($"id" * 10).cast("double").as("lo"),
        ($"id" * 10 + 15).cast("double").as("hi"))
    val plan = RangeJoin.binned(points, intervals, "v", "lo", "hi", binWidth = 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan.take(500))
  }
}
