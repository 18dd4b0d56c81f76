package graft

import org.apache.spark.sql.functions._

import graft.operators.IncrementalJoin

/** IVM delta-rule correctness (operators.IncrementalJoin): the
  * refreshed view equals the full recompute for every way of
  * splitting both sides — including empty deltas and keys that exist
  * only in a delta.
  */
class IncrementalJoinSpec extends SparkSuite {
  import spark.implicits._

  private val left = (0L until 60L).map(i => (i, i % 7, s"l$i")).toDF("lid", "k", "lv")
  private val right = (0L until 25L).map(i => (i, i % 7, s"r$i")).toDF("rid", "k", "rv")

  private def full = left.join(right, Seq("k"))
    .select($"k", $"lid", $"lv", $"rid", $"rv")

  test("refreshed == full recompute across delta splits") {
    for (m <- Seq(2L, 3L, 13L)) {
      val (a0, da) = (left.filter($"lid" % m =!= 0), left.filter($"lid" % m === 0))
      val (b0, db) = (right.filter($"rid" % (m + 1) =!= 0), right.filter($"rid" % (m + 1) === 0))
      val state = a0.join(b0, Seq("k")).select($"k", $"lid", $"lv", $"rid", $"rv")
      val got = IncrementalJoin.refreshed(state, a0, da, b0, db, Seq("k"))
        .select($"k", $"lid", $"lv", $"rid", $"rv")
        .as[(Long, Long, String, Long, String)].collect().sorted
      val want = full.as[(Long, Long, String, Long, String)].collect().sorted
      assert(got.toSeq === want.toSeq, s"split m=$m")
    }
  }

  test("empty deltas leave the state unchanged") {
    val state = full
    val got = IncrementalJoin.refreshed(state, left, left.limit(0),
        right, right.limit(0), Seq("k"))
      .as[(Long, Long, String, Long, String)].collect().sorted
    assert(got.toSeq === full.as[(Long, Long, String, Long, String)].collect().sorted.toSeq)
  }

  test("a key born entirely in the deltas joins via the delta-delta term") {
    val da = Seq((100L, 99L, "lX")).toDF("lid", "k", "lv")
    val db = Seq((100L, 99L, "rX")).toDF("rid", "k", "rv")
    val state = left.join(right, Seq("k")).select($"k", $"lid", $"lv", $"rid", $"rv")
    val got = IncrementalJoin.refreshed(state, left, da, right, db, Seq("k"))
    assert(got.filter($"k" === 99L).count() === 1L)
  }
}
