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

  /** @param ttl optional state TTL: per-key state not updated within
    *        the duration is expired by the store (the production
    *        hygiene knob for unbounded key spaces — abandoned keys
    *        stop costing memory without hand-rolled timeouts).
    */
  class RunningAggProcessor(ttl: Option[java.time.Duration] = None)
    extends StatefulProcessor[Long, EventIn, UserAgg] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[UserAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserAgg](
        "agg", Encoders.product[UserAgg],
        ttl.map(org.apache.spark.sql.streaming.TTLConfig.apply)
          .getOrElse(org.apache.spark.sql.streaming.TTLConfig.NONE))

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
  def runningAgg(spark: SparkSession, events: DataFrame,
      ttl: Option[java.time.Duration] = None): Dataset[UserAgg] = {
    import spark.implicits._
    events.selectExpr("user_id", "value").as[EventIn]
      .groupByKey(_.user_id)
      .transformWithState(new RunningAggProcessor(ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update())
  }

  // ---- exponential smoothing (EWMA) ---------------------------------

  case class EwmaIn(event_type: String, event_id: Long,
      ts: java.sql.Timestamp, value: Double)
  case class EwmaOut(event_type: String, n: Long, ewma: Double)

  /** Per-key exponentially weighted moving average — the classic
    * streaming-telemetry smoother (y ← α·x + (1−α)·y). The recurrence
    * is order-dependent and therefore NOT a window/aggregate
    * composition at scale ((1−α)^-i reweighting overflows doubles
    * beyond a few thousand rows) — per-key managed state folding each
    * batch in (ts, event_id) order is the honest distributed form.
    * State is one (n, ewma) pair per key: O(distinct keys), store-
    * managed.
    */
  class EwmaProcessor(alpha: Double)
    extends StatefulProcessor[String, EwmaIn, EwmaOut] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[EwmaOut] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[EwmaOut](
        "ewma", Encoders.product[EwmaOut],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[EwmaIn],
        timers: TimerValues): Iterator[EwmaOut] = {
      val prev = Option(state.get())
      var n = prev.map(_.n).getOrElse(0L)
      var y = prev.map(_.ewma).getOrElse(0.0)
      // rows within a batch are unordered; (ts, event_id) is a total
      // order so the fold is deterministic at any parallelism.
      // getTime alone truncates to milliseconds — getNanos carries the
      // full sub-second fraction, so sub-ms data still folds in true
      // time order. floorDiv, not /: getTime/1000 truncates TOWARD
      // ZERO for pre-epoch timestamps while getNanos stays in
      // [0, 1e9), which would sort -0.5s after -1.0s.
      rows.toSeq.sortBy(r => (Math.floorDiv(r.ts.getTime, 1000L), r.ts.getNanos, r.event_id))
        .foreach { r =>
        y = if (n == 0) r.value else alpha * r.value + (1.0 - alpha) * y
        n += 1
      }
      val next = EwmaOut(key, n, y)
      state.update(next)
      Iterator.single(next)
    }
  }

  /** EWMA of `value` per event_type over the events stream. Batch
    * boundaries must not change the result (the fold just resumes
    * from state) — EwmaSpec proves 1-batch == 3-batch == a driver
    * reference fold.
    */
  def ewma(spark: SparkSession, events: DataFrame,
      alpha: Double = 0.2): Dataset[EwmaOut] = {
    import spark.implicits._
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    events.selectExpr("event_type", "event_id", "ts", "value").as[EwmaIn]
      .groupByKey(_.event_type)
      .transformWithState(new EwmaProcessor(alpha),
        TimeMode.None(), OutputMode.Update())
  }

  /** transformWithState requires RocksDB-backed state. */
  def withRocksDb(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  // ---- event-time sessionization with timers ------------------------

  case class TimedEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long, n: Long, total: Double)

  /** Custom event-time sessionization: per-key ValueState holds the
    * open session; a gap-break inside a batch emits the closed
    * session immediately, and an EVENT-TIME TIMER at (end + gap)
    * flushes the open session once the watermark passes — the state
    * never outlives the data (the hand-built analog of
    * `session_window`, demonstrating the full Spark 4 timer API).
    *
    * Rows inside one handleInputRows call are not ordered; the batch
    * is sorted by ts in the handler (bounded by per-key batch volume).
    */
  class SessionizeProcessor(gapMs: Long)
    extends StatefulProcessor[Long, TimedEvent, Session] {
    @transient private var open: org.apache.spark.sql.streaming.ValueState[Session] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[Session](
        "open", Encoders.product[Session], org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TimedEvent],
        timers: TimerValues): Iterator[Session] = {
      // sessionize THIS batch locally, then coalesce with the open
      // session from state — late cross-batch events (before the open
      // session's start, bridged chains of them, anything the
      // watermark admits) land exactly as session_window would place
      // them, instead of inheriting the open session's boundaries
      val batch = scala.collection.mutable.ListBuffer.empty[Session]
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        batch.lastOption match {
          case Some(s) if t - s.end_ms <= gapMs =>
            batch(batch.length - 1) =
              Session(key, s.start_ms, math.max(s.end_ms, t), s.n + 1, s.total + e.value)
          case _ => batch += Session(key, t, t, 1L, e.value)
        }
      }
      val merged = (Option(open.get()).toSeq ++ batch).sortBy(_.start_ms)
        .foldLeft(List.empty[Session]) {
          case (prev :: done, s) if s.start_ms - prev.end_ms <= gapMs =>
            Session(key, prev.start_ms, math.max(prev.end_ms, s.end_ms),
              prev.n + s.n, prev.total + s.total) :: done
          case (acc, s) => s :: acc
        }.reverse
      merged.lastOption.foreach { s =>
        open.update(s)
        // flush when the watermark passes the session's gap horizon
        getHandle.registerTimer(s.end_ms + gapMs)
      }
      merged.dropRight(1).iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Session] = {
      val s = open.get()
      if (s != null && s.end_ms + gapMs <= expired.getExpiryTimeInMs()) {
        open.clear()
        Iterator.single(s)
      } else Iterator.empty
    }
  }

  /** Sessionize the events stream with a 10-minute gap (the
    * session_window analog, state flushed by event-time timers).
    */
  def sessionize(spark: SparkSession, events: DataFrame,
      gap: java.time.Duration = java.time.Duration.ofMinutes(10)): Dataset[Session] = {
    import spark.implicits._
    events.withWatermark("ts", "10 minutes")
      .selectExpr("user_id", "ts", "value").as[TimedEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionizeProcessor(gap.toMillis),
        TimeMode.EventTime(), OutputMode.Append())
  }

  // ---- streaming heavy hitters (Misra–Gries in managed state) ---------

  case class HHIn(event_type: String, user_id: Long)
  case class HHOut(event_type: String, terms: String, err: Long, n: Long)

  /** Streaming Misra–Gries heavy hitters: the k-counter sketch of
    * [[graft.functions.FreqItems]] held as per-key MANAGED state
    * (MapState for the counters — point updates, no full-value
    * rewrite — plus a (dec, n) ValueState), folded batch after batch.
    * MG's guarantees are order-free, so the multi-batch stream obeys
    * the same invariants as one pass over the concatenated stream:
    * est(x) ≤ true(x) ≤ est(x) + dec, no false negatives above dec,
    * dec ≤ n/(k+1) — StreamingHeavyHittersSpec asserts all three
    * against exact counts. The streaming form answers "top users per
    * event type, continuously, unbounded key space" in O(k) state per
    * key — the thing a windowed exact top-k cannot do when distinct
    * users outgrow state.
    */
  class HeavyHittersProcessor(k: Int)
    extends StatefulProcessor[String, HHIn, HHOut] {
    require(k > 0)
    @transient private var counters: org.apache.spark.sql.streaming.MapState[String, Long] = _
    @transient private var meta: org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counters = getHandle.getMapState[String, Long](
        "mg", Encoders.STRING, Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      meta = getHandle.getValueState[(Long, Long)](
        "meta", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[HHIn],
        timers: TimerValues): Iterator[HHOut] = {
      var (dec, n) = Option(meta.get()).getOrElse((0L, 0L))
      // fold on a local snapshot (≤ k entries), write back once
      val local = scala.collection.mutable.HashMap(counters.iterator().toSeq: _*)
      val before = local.keySet.toSet
      rows.foreach { r =>
        val item = r.user_id.toString
        n += 1
        local.get(item) match {
          case Some(c) => local.update(item, c + 1)
          case None if local.size < k => local.update(item, 1L)
          case None =>
            dec += 1
            val dead = scala.collection.mutable.ArrayBuffer.empty[String]
            local.foreach { case (t, c) =>
              if (c == 1L) dead += t else local.update(t, c - 1)
            }
            dead.foreach(local.remove)
        }
      }
      (before -- local.keySet).foreach(counters.removeKey)
      local.foreach { case (t, c) => counters.updateValue(t, c) }
      meta.update((dec, n))
      val terms = local.toSeq.sortBy { case (t, c) => (-c, t) }
        .map { case (t, c) => s"$t=$c" }.mkString(",")
      Iterator.single(HHOut(key, terms, dec, n))
    }
  }

  /** Per-event-type heavy users over the events stream, k counters. */
  def heavyHitters(spark: SparkSession, events: DataFrame, k: Int = 8): Dataset[HHOut] = {
    import spark.implicits._
    events.selectExpr("event_type", "user_id").as[HHIn]
      .groupByKey(_.event_type)
      .transformWithState(new HeavyHittersProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  // ---- MapState + ListState profile -----------------------------------

  case class TypedEvent(user_id: Long, ts: java.sql.Timestamp,
      event_type: String, value: Double)
  case class UserProfile(user_id: Long, type_counts: String, recent_avg: Double)

  /** Per-user profile from the remaining state primitives: MapState
    * (count per event_type — O(distinct types) per key, updated
    * point-wise, no full-value rewrite like ValueState[Map]) and
    * ListState (the last `keep` values by event time — appended,
    * trimmed on read). Emits one snapshot per key per batch.
    */
  class ProfileProcessor(keep: Int)
    extends StatefulProcessor[Long, TypedEvent, UserProfile] {
    @transient private var counts: org.apache.spark.sql.streaming.MapState[String, Long] = _
    @transient private var recent: org.apache.spark.sql.streaming.ListState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      recent = getHandle.getListState[(Long, Double)](
        "recent", Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[TypedEvent],
        timers: TimerValues): Iterator[UserProfile] = {
      rows.foreach { e =>
        val c = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, c + 1)
        recent.appendValue((e.ts.getTime, e.value))
      }
      // trim the list to the last `keep` by event time (value as
      // tie-break: duplicate (user, ts) pairs exist in the fixture)
      val all = recent.get().toSeq.sortBy(t => (-t._1, t._2))
      val kept = all.take(keep)
      recent.put(kept.toArray)
      val profile = counts.iterator().toSeq.sortBy(_._1)
        .map { case (t, n) => s"$t=$n" }.mkString(",")
      val avg = if (kept.isEmpty) 0.0 else kept.map(_._2).sum / kept.size
      Iterator.single(UserProfile(key, profile, avg))
    }
  }

  /** Per-user (type counts, recent-N average) over the events stream. */
  def profiles(spark: SparkSession, events: DataFrame, keep: Int = 3): Dataset[UserProfile] = {
    import spark.implicits._
    events.selectExpr("user_id", "ts", "event_type", "value").as[TypedEvent]
      .groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor(keep),
        TimeMode.None(), OutputMode.Update())
  }

  // ---- streaming Count–Min maintenance --------------------------------

  case class CmsIn(event_type: String, item: String)
  case class CmsSnapshot(event_type: String, n: Long, sketch: Seq[Long])

  /** Per-key Count–Min sketch maintained incrementally across micro-
    * batches — the streaming form of the batch `graft_cms` aggregate,
    * sharing [[graft.functions.CountMin.bucket]] so the state sketch
    * after N batches is BIT-IDENTICAL to a one-shot batch sketch over
    * the same rows (the sketch is linear; StreamingSketchDriftSpec asserts exact
    * equality at 1 and 3 batch granularities). State is depth×width
    * longs per key — fixed regardless of item cardinality, the whole
    * point: a streaming exact per-item count would grow state with
    * distinct items; this never does.
    */
  class CmsProcessor(depth: Int, width: Int)
    extends StatefulProcessor[String, CmsIn, CmsSnapshot] {
    require(depth > 0 && depth <= graft.functions.CountMin.maxDepth && width > 0,
      s"CmsProcessor: depth must be in [1, ${graft.functions.CountMin.maxDepth}], width positive")
    @transient private var sketch: org.apache.spark.sql.streaming.ValueState[Array[Long]] = _
    @transient private var total: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sketch = getHandle.getValueState[Array[Long]](
        "cms", Encoders.javaSerialization[Array[Long]],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      total = getHandle.getValueState[Long](
        "n", Encoders.scalaLong, org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[CmsIn],
        timers: TimerValues): Iterator[CmsSnapshot] = {
      val sk = Option(sketch.get()).getOrElse(new Array[Long](depth * width))
      var n = Option(total.get()).getOrElse(0L)
      rows.foreach { r =>
        // n counts every ROW processed for the key (the same meaning
        // as the batch side's count(*)); null items still advance it,
        // they just can't be hashed into the sketch
        n += 1
        if (r.item != null) {
          var i = 0
          while (i < depth) {
            sk(i * width + graft.functions.CountMin.bucket(r.item, i, width)) += 1L
            i += 1
          }
        }
      }
      sketch.update(sk)
      total.update(n)
      // emit with the same [depth, width] geometry header as the batch
      // graft_cms aggregate, so snapshots and batch sketches compare
      // and probe identically
      Iterator.single(CmsSnapshot(key, n,
        Seq(depth.toLong, width.toLong) ++ sk.toSeq))
    }
  }

  /** Per-event-type token sketch over the events stream (items =
    * user ids — "how often has user X hit type T", bounded state). */
  def cmsByType(spark: SparkSession, events: DataFrame,
      depth: Int = 4, width: Int = 256): Dataset[CmsSnapshot] = {
    import spark.implicits._
    events.selectExpr("event_type", "CAST(user_id AS STRING) AS item").as[CmsIn]
      .groupByKey(_.event_type)
      .transformWithState(new CmsProcessor(depth, width),
        TimeMode.None(), OutputMode.Update())
  }
}
