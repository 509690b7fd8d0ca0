package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event of the typed custom-state pipeline (events-table shape). */
final case class UserEvent(user_id: Long, event_id: Long,
    ts: java.sql.Timestamp, value: Double)

/** Custom state carried per user across micro-batches. */
final case class RunState(seq: Long, runMax: Double)

/** Output row: the event annotated with its running per-user stats. */
final case class RunOut(user_id: Long, event_id: Long, seq: Long,
    run_max: Double)

/** Per-key session aggregate carried across micro-batches (timerMs =
  * the single live event-time timer armed for this key; 0 = none). */
final case class EwmaState(ewma: Double)
final case class EwmaOut(user_id: Long, event_id: Long, ewma: Double)

final case class SessionAgg(startMs: Long, lastMs: Long, n: Long,
    sum: Double, timerMs: Long)

/** One closed session: emitted on gap-out (a later event arrived past
  * the gap) or on event-time timer expiry (watermark passed
  * `lastMs + gap` with no successor). */
final case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
    n_events: Long, sum_value: Double)

/** Custom-state operators over `KeyValueGroupedDataset` — the
  * `mapGroupsWithState`/`flatMapGroupsWithState` surface the north star
  * names for state Spark's built-in operators can't express. The demo
  * semantic — event-time running sequence number and running max per
  * user — is deliberately ALSO expressible as SQL window functions, so
  * the batch form is DuckDB-oracle-gated (q_stateful_running) and the
  * streaming form can be cross-checked against it; a production use of
  * this hook is precisely the state shape window functions cannot run
  * incrementally on an unbounded stream.
  *
  * Scale note: state is one small case class per key in both forms. The
  * batch form never buffers a group: it repartitions on the key, lets
  * Spark's EXTERNAL (spilling) sort order each partition by (key, time),
  * and streams the partition iterator through the state machine — a hot
  * key with millions of events costs disk spill, not an executor OOM.
  * The streaming form's per-micro-batch groups are bounded by trigger
  * size. Typed `Encoder`s keep rows in Tungsten format off-heap.
  */
object StatefulOps {

  private def advance(seq0: Long, max0: Double, events: Seq[UserEvent])
      : (Seq[RunOut], Long, Double) = {
    var seq = seq0
    var mx = max0
    val out = events.map { e =>
      seq += 1
      mx = math.max(mx, e.value)
      RunOut(e.user_id, e.event_id, seq, mx)
    }
    (out, seq, mx)
  }

  private def eventOrder(e: UserEvent) = (e.ts.getTime, e.event_id)

  /** Batch form: per-key custom state as one streamed pass over a
    * key-clustered, time-ordered partition. Equivalent to
    * `groupByKey(...).flatMapGroups` with an in-group sort — but that
    * shape buffers each group in memory (`it.toSeq`), which a hot key
    * turns into an executor OOM at 100×. Here the shuffle clusters keys,
    * the partition-local sort is Spark's external spilling sort, and the
    * state machine resets whenever the key changes — O(1) state, zero
    * group buffering. */
  def runningStats(ev: Dataset[UserEvent]): Dataset[RunOut] = {
    implicit val outEnc = Encoders.product[RunOut]
    ev.repartition(ev("user_id"))
      .sortWithinPartitions(ev("user_id"), ev("ts"), ev("event_id"))
      .mapPartitions { it =>
        var cur = Long.MinValue
        var seq = 0L
        var mx = Double.NegativeInfinity
        it.map { e =>
          if (e.user_id != cur) {
            cur = e.user_id; seq = 0L; mx = Double.NegativeInfinity
          }
          seq += 1
          mx = math.max(mx, e.value)
          RunOut(e.user_id, e.event_id, seq, mx)
        }
      }
  }

  /** The same running-stats state machine on Spark 4's
    * `transformWithState` operator — the arbitrary-state API that
    * SUPERSEDES `flatMapGroupsWithState` for new pipelines: typed state
    * variables (`ValueState`/`ListState`/`MapState`) with per-variable
    * TTL, timers, and schema evolution, executed ONLY on the RocksDB
    * state store ([[StateStores]]) — the pairing this engine's 100 TB
    * streaming-state story standardizes on. Semantics are pinned equal
    * to both the fMGWS form and the oracle-gated batch form
    * (StateStoreSpec). */
  final class RunningStatsProcessor(
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, UserEvent, RunOut] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[RunState] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[RunState]("runState",
        Encoders.product[RunState], ttl)
    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[RunOut] = {
      val st =
        if (state.exists()) state.get()
        else RunState(0L, Double.NegativeInfinity)
      val (out, seq, mx) = advance(st.seq, st.runMax,
        rows.toSeq.sortBy(eventOrder))
      state.update(RunState(seq, mx))
      out.iterator
    }
  }

  /** [[runningStatsStream]] on the `transformWithState` operator
    * (requires the RocksDB state store provider). A finite `ttl` bounds
    * idle per-key state — the knob that keeps an unbounded key space
    * (session ids, doc fingerprints) from growing state forever at
    * 100 TB; expiry resets the key's running stats. TTL state requires
    * processing-time mode, so the time mode follows the config. */
  def runningStatsTws(ev: Dataset[UserEvent],
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE): Dataset[RunOut] = {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}
    implicit val outEnc = Encoders.product[RunOut]
    implicit val keyEnc = Encoders.scalaLong
    val mode = if (ttl == TTLConfig.NONE) TimeMode.None()
      else TimeMode.ProcessingTime()
    ev.groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor(ttl), mode,
        OutputMode.Append())
  }

  private def advanceEwma(st: Option[Double], alpha: Double,
      events: Seq[UserEvent]): (Seq[EwmaOut], Double) = {
    var s = st.getOrElse(Double.NaN)
    val out = events.map { e =>
      s = if (s.isNaN) e.value else alpha * e.value + (1 - alpha) * s
      EwmaOut(e.user_id, e.event_id, s)
    }
    (out, s)
  }

  /** Batch form of the RECURSIVE per-key EWMA
    * (`s_t = α·x_t + (1−α)·s_{t−1}`, seeded at the first value) — the
    * streaming-natural spelling whose whole state is ONE double per
    * key, vs the batch tier's bounded-window normalized q_ewma
    * (EventOps.ewma); after `span` rows the two agree within
    * `(1−α)^span` of the value range. Same no-group-buffering shape
    * as [[runningStats]]: key-clustered shuffle, external sort, O(1)
    * streamed state. */
  def ewmaBatch(ev: Dataset[UserEvent], alpha: Double = 0.3)
      : Dataset[EwmaOut] = {
    require(alpha > 0.0 && alpha < 1.0,
      s"alpha must be in (0, 1); got $alpha")
    implicit val outEnc = Encoders.product[EwmaOut]
    ev.repartition(ev("user_id"))
      .sortWithinPartitions(ev("user_id"), ev("ts"), ev("event_id"))
      .mapPartitions { it =>
        var cur = Long.MinValue
        var s = Double.NaN
        it.map { e =>
          if (e.user_id != cur) { cur = e.user_id; s = Double.NaN }
          s = if (s.isNaN) e.value else alpha * e.value + (1 - alpha) * s
          EwmaOut(e.user_id, e.event_id, s)
        }
      }
  }

  /** The recursive EWMA on `transformWithState`: one
    * `ValueState[EwmaState]` per key (a single double — the smallest
    * possible streaming-smoothing state), rows folded in event order
    * within each batch, state carried across micro-batches. TTL as in
    * [[runningStatsTws]]. StateStoreSpec pins stream ≡ batch at any
    * micro-batch split. */
  final class EwmaProcessor(alpha: Double,
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, UserEvent, EwmaOut] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[EwmaState] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[EwmaState]("ewmaState",
        Encoders.product[EwmaState], ttl)
    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[EwmaOut] = {
      val st = if (state.exists()) Some(state.get().ewma) else None
      val (out, s) = advanceEwma(st, alpha,
        rows.toSeq.sortBy(eventOrder))
      state.update(EwmaState(s))
      out.iterator
    }
  }

  /** Streaming recursive EWMA (requires the RocksDB provider — the
    * transformWithState contract). */
  def ewmaTws(ev: Dataset[UserEvent], alpha: Double = 0.3,
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE): Dataset[EwmaOut] = {
    require(alpha > 0.0 && alpha < 1.0,
      s"alpha must be in (0, 1); got $alpha")
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}
    implicit val outEnc = Encoders.product[EwmaOut]
    implicit val keyEnc = Encoders.scalaLong
    val mode = if (ttl == TTLConfig.NONE) TimeMode.None()
      else TimeMode.ProcessingTime()
    ev.groupByKey(_.user_id)
      .transformWithState(new EwmaProcessor(alpha, ttl), mode,
        OutputMode.Append())
  }

  /** Event-time session gap-out via `transformWithState` TIMERS — the
    * remaining arbitrary-state surface Spark 4 offers beyond state
    * variables: a session aggregate per user closes either when a
    * LATER event of the same user arrives past the gap (in-stream
    * detection) or, crucially, when the EVENT-TIME WATERMARK passes
    * `last_event + gap` with no successor — the timer path, which is
    * the only way an idle key's final session ever emits. One
    * ValueState + one armed timer per key; each new batch of a key
    * re-arms its timer (delete + register), so exactly one timer per
    * key is live and timer state stays O(keys). */
  final class SessionizeProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, UserEvent, SessionOut] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode,
      TTLConfig, TimerValues, ExpiredTimerInfo}
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[SessionAgg] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionAgg]("session",
        Encoders.product[SessionAgg], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timers: TimerValues): Iterator[SessionOut] = {
      val evs = rows.toSeq.sortBy(eventOrder)
      var closed = List.empty[SessionOut]
      var st: SessionAgg =
        if (state.exists()) state.get() else null
      evs.foreach { e =>
        val t = e.ts.getTime
        if (st == null)
          st = SessionAgg(t, t, 1L, e.value, 0L)
        else if (t - st.lastMs > gapMs) {
          closed ::= SessionOut(key, st.startMs, st.lastMs, st.n, st.sum)
          st = SessionAgg(t, t, 1L, e.value, 0L)
        } else
          st = st.copy(lastMs = math.max(st.lastMs, t), n = st.n + 1L,
            sum = st.sum + e.value)
      }
      // re-arm: at most one live timer per key
      if (st.timerMs > 0L) getHandle.deleteTimer(st.timerMs)
      val timerMs = st.lastMs + gapMs
      getHandle.registerTimer(timerMs)
      state.update(st.copy(timerMs = timerMs))
      closed.reverse.iterator
    }
    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (state.exists()) {
        val st = state.get()
        // a stale timer (superseded by a re-arm) must not close the
        // successor session
        if (st.timerMs == expired.getExpiryTimeInMs) {
          state.clear()
          return Iterator(
            SessionOut(key, st.startMs, st.lastMs, st.n, st.sum))
        }
      }
      Iterator.empty
    }
  }

  /** [[SessionizeProcessor]] wired to event time: watermark on `ts`
    * (the timer clock), `TimeMode.EventTime`. Emits one row per CLOSED
    * session — gap-superseded in-stream or timed out at the
    * watermark. */
  def sessionizeTws(ev: Dataset[UserEvent], gapMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.TimeMode
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val keyEnc = Encoders.scalaLong
    ev.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionizeProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** The same session gap-out on `flatMapGroupsWithState` with
    * `GroupStateTimeout.EventTimeTimeout` — the event-time-timer
    * surface that runs under BOTH state-store providers
    * (`transformWithState` requires RocksDB's column families;
    * StateStoreSpec pins that fail-fast). Semantics identical to
    * [[sessionizeTws]]: close on in-stream gap-out or when the
    * watermark passes `last + gap` (the timeout callback). */
  def sessionizeStream(ev: Dataset[UserEvent], gapMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stateEnc = Encoders.product[SessionAgg]
    implicit val keyEnc = Encoders.scalaLong
    ev.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[UserEvent], state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator(SessionOut(key, st.startMs, st.lastMs, st.n, st.sum))
          } else {
            val evs = it.toSeq.sortBy(eventOrder)
            var closed = List.empty[SessionOut]
            var st: SessionAgg =
              state.getOption.orNull
            evs.foreach { e =>
              val t = e.ts.getTime
              if (st == null)
                st = SessionAgg(t, t, 1L, e.value, 0L)
              else if (t - st.lastMs > gapMs) {
                closed ::= SessionOut(key, st.startMs, st.lastMs,
                  st.n, st.sum)
                st = SessionAgg(t, t, 1L, e.value, 0L)
              } else
                st = st.copy(lastMs = math.max(st.lastMs, t),
                  n = st.n + 1L, sum = st.sum + e.value)
            }
            state.update(st)
            state.setTimeoutTimestamp(st.lastMs + gapMs)
            closed.reverse.iterator
          }
      }
  }

  /** Streaming form: the same state machine as `runningStats`, carried
    * across micro-batches by `flatMapGroupsWithState`. Within a batch,
    * events sort by event time; the `RunState` persists per user. */
  def runningStatsStream(ev: Dataset[UserEvent]): Dataset[RunOut] = {
    implicit val outEnc = Encoders.product[RunOut]
    implicit val stateEnc = Encoders.product[RunState]
    implicit val keyEnc = Encoders.scalaLong
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[UserEvent], state: GroupState[RunState]) =>
          val st = state.getOption.getOrElse(
            RunState(0L, Double.NegativeInfinity))
          val (out, seq, mx) =
            advance(st.seq, st.runMax, it.toSeq.sortBy(eventOrder))
          state.update(RunState(seq, mx))
          out.iterator
      }
  }
}
