package graft

import org.apache.spark.sql.functions._

import sources.Sinks

/** Real JDBC round trip for the reference's actual sink shape
  * (Postgres via psycopg2 in the reference; here embedded Derby —
  * shipped with Spark — so the batched JDBC writer path runs for
  * real: table auto-create, append semantics, typed readback).
  */
class JdbcRoundTripSpec extends SparkSuite {
  import spark.implicits._

  // keep Derby's log out of the repo working tree
  System.setProperty("derby.stream.error.file", "/tmp/graft-derby.log")

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private def props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("appendJdbc creates the table, appends batches, reads back typed") {
    val batch1 = Tables.table(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"event_type", $"value")
      .filter($"event_id" < 100)
    val batch2 = Tables.table(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"event_type", $"value")
      .filter($"event_id" >= 100 && $"event_id" < 200)
    val n1 = batch1.count()
    val n2 = batch2.count()
    assert(n1 > 0 && n2 > 0)

    Sinks.appendJdbc(batch1, url, "events_sink", props) // auto-create
    Sinks.appendJdbc(batch2, url, "events_sink", props) // append

    val back = spark.read.jdbc(url, "events_sink", props)
    assert(back.count() === n1 + n2)
    // typed, value-exact readback
    val want = batch1.unionByName(batch2)
      .as[(Long, Long, String, Double)].collect().toSet
    val got = back
      .select($"event_id", $"user_id", $"event_type", $"value")
      .as[(Long, Long, String, Double)].collect().toSet
    assert(got === want)
  }

  test("append is NOT idempotent — the upsert operator is the dedup layer") {
    val df = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    Sinks.appendJdbc(df, url, "raw_appends", props)
    Sinks.appendJdbc(df, url, "raw_appends", props)
    val back = spark.read.jdbc(url, "raw_appends", props)
    assert(back.count() === 4) // duplicates present: that's why U1/U2 exist
    val merged = operators.Upsert.dedupKeyed(back, Seq("k"), Seq(col("v")))
    assert(merged.count() === 2)
  }
}
