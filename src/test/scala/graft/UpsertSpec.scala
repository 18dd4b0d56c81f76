package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Upsert

/** U1/U2 semantics (SURVEY.md §2.6) — mirrors the reference's
  * ON CONFLICT DO UPDATE contract (weather-etl.py:152-163): incoming
  * wins, unmatched targets survive, replays are no-ops.
  */
class UpsertSpec extends SparkSuite {
  import spark.implicits._

  private def target: DataFrame =
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "name", "v")
  private def incoming: DataFrame =
    Seq((2L, "b2", 200.0), (4L, "d", 40.0)).toDF("k", "name", "v")

  private def asSet(df: DataFrame): Set[(Long, String, Double)] =
    df.select($"k", $"name", $"v").as[(Long, String, Double)].collect().toSet

  test("upsert: incoming wins on conflict, unmatched target survives") {
    val merged = Upsert.upsert(target, incoming, Seq("k"))
    assert(asSet(merged) === Set(
      (1L, "a", 10.0), (2L, "b2", 200.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("upsert is idempotent under replay (weather-etl.py replay tolerance)") {
    val once = Upsert.upsert(target, incoming, Seq("k"))
    val twice = Upsert.upsert(once, incoming, Seq("k"))
    assert(asSet(once) === asSet(twice))
  }

  test("upsertByPriority matches upsert for key-unique batches") {
    val a = Upsert.upsert(target, incoming, Seq("k"))
    val b = Upsert.upsertByPriority(target, incoming, Seq("k"), Seq(col("v")))
    assert(asSet(a) === asSet(b))
  }

  test("upsertByPriority resolves intra-batch duplicates by order col") {
    val dup = Seq((2L, "first", 1.0), (2L, "second", 2.0)).toDF("k", "name", "v")
    val merged = Upsert.upsertByPriority(target, dup, Seq("k"), Seq(col("v")))
    assert(asSet(merged).contains((2L, "second", 2.0)))
    assert(!asSet(merged).exists(_._2 == "first"))
  }

  test("dedupKeyed keeps exactly the greatest-order row per key") {
    val df = Seq((1L, 1, "old"), (1L, 2, "new"), (2L, 5, "only"))
      .toDF("k", "seq", "tag")
    val out = Upsert.dedupKeyed(df, Seq("k"), Seq(col("seq")))
      .select($"k", $"seq", $"tag").as[(Long, Int, String)].collect().toSet
    assert(out === Set((1L, 2, "new"), (2L, 5, "only")))
  }

  test("dedup fixpoint: dedupKeyed twice equals once") {
    val ev = Tables.events(spark, sfDir)
    val once = Upsert.dedupKeyed(ev, Seq("user_id"), Seq(col("ts"), col("event_id")))
    val twice = Upsert.dedupKeyed(once, Seq("user_id"), Seq(col("ts"), col("event_id")))
    assert(once.count() === twice.count())
    assert(once.except(twice).isEmpty)
  }
}
