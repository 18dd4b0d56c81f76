package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues}

/** Spark 4 `transformWithState` form of the per-key running aggregate
  * (SURVEY.md §2.7 optional stateful row) — the successor API to
  * mapGroupsWithState: typed state variables managed by the RocksDB
  * state store, per-variable TTL, timers.
  *
  * State here is one ValueState[UserAgg] per user — O(distinct keys)
  * like [[StreamingJobs.latestSnapshot]], but with store-managed
  * eviction instead of hand-rolled timeouts at scale.
  */
object TransformWithStateJobs {

  case class EventIn(user_id: Long, value: Double)
  case class UserAgg(user_id: Long, n: Long, total: Double)

  class RunningAggProcessor extends StatefulProcessor[Long, EventIn, UserAgg] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[UserAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserAgg](
        "agg", Encoders.product[UserAgg], org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
        timers: TimerValues): Iterator[UserAgg] = {
      val prev = Option(state.get()).getOrElse(UserAgg(key, 0L, 0.0))
      var n = prev.n
      var total = prev.total
      rows.foreach { r => n += 1; total += r.value }
      val next = UserAgg(key, n, total)
      state.update(next)
      Iterator.single(next)
    }
  }

  /** Running (count, sum) per user over the events stream. Requires
    * the RocksDB state store provider (set by [[withRocksDb]]).
    */
  def runningAgg(spark: SparkSession, events: DataFrame): Dataset[UserAgg] = {
    import spark.implicits._
    events.selectExpr("user_id", "value").as[EventIn]
      .groupByKey(_.user_id)
      .transformWithState(new RunningAggProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** transformWithState requires RocksDB-backed state. */
  def withRocksDb(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}
