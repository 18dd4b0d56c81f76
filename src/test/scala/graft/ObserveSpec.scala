package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Structured pipeline metrics (weather-etl.py:123 analog): observe()
  * rides the job — zero extra passes — and surfaces counters through
  * the Observation API / QueryExecutionListener.
  */
class ObserveSpec extends SparkSuite {

  test("observe() surfaces ingest metrics without a second pass") {
    val obs = Observation("ingest")
    val ev = Tables.events(spark, sfDir)
      .observe(obs, count(lit(1)).as("rows_in"),
        sum(col("value")).as("value_sum"),
        count(when(col("value") > 150, 1)).as("big_values"))
    val n = ev.count()
    val m = obs.get
    assert(m("rows_in") === n)
    assert(m("big_values").asInstanceOf[Long] > 0)
    assert(m("value_sum").asInstanceOf[Double] > 0)
  }

  test("flagship entry declares the graft_ingest observed metrics") {
    val df = SparkEntry.entry(spark)
    df.count()
    // the metric is attached to the plan via CollectMetrics
    assert(df.queryExecution.analyzed.toString.contains("graft_ingest"))
  }
}
