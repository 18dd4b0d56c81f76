package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Regression guard for the events `ts` loader (r6 postmortem: a stale
  * nanos-as-long assumption in Tables.events broke 37 queries when the
  * fixture regenerated with ts as timestamp[us]). The loader must yield
  * session-timezone TimestampType on EVERY sf dir, whatever the on-disk
  * encoding, and the values must sit in the fixture's real time range.
  */
class EventsTsSpec extends SparkSuite {

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"events ts is TimestampType and populated on $sf") {
      // only sf0.001 is guaranteed present (SparkSuite.sfDir); skip,
      // don't fail, where a larger fixture isn't materialized
      assume(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"/root/testdata/$sf/events.parquet")),
        s"fixture $sf not present")
      val df = Tables.events(spark, s"/root/testdata/$sf")
      assert(df.schema("ts").dataType == TimestampType,
        s"ts resolved as ${df.schema("ts").dataType}")
      val row = df.agg(
        count(lit(1)).as("n"),
        count(col("ts")).as("n_ts"),
        min(year(col("ts"))).as("y_min"),
        max(year(col("ts"))).as("y_max")).head()
      assert(row.getLong(0) > 0, "events fixture is empty")
      assert(row.getLong(1) == row.getLong(0), "null ts values after normalize")
      // Sanity window: a unit mix-up (s vs ms vs µs vs ns) lands decades away.
      assert(row.getInt(2) >= 1990 && row.getInt(3) <= 2100,
        s"ts out of plausible range: years ${row.getInt(2)}..${row.getInt(3)}")
    }
  }

  test("streaming reader yields the same normalized ts schema") {
    val stream = graft.streaming.StreamingJobs.readEvents(spark, sfDir)
    assert(stream.schema("ts").dataType == TimestampType,
      s"streaming ts resolved as ${stream.schema("ts").dataType}")
  }
}
