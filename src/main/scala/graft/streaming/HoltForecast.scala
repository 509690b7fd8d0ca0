package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.OutputMode

final case class HoltState(level: Double, trend: Double, seen: Long)
final case class HoltOut(user_id: Long, event_id: Long, value: Double,
    level: Double, trend: Double, forecast: Double)

/** Per-key Holt double exponential smoothing (level + trend) with an
  * h-step-ahead forecast — the prediction primitive next to the
  * descriptive tier (q_ewma smooths, q_trend fits a line over the
  * past; Holt EXTRAPOLATES, which is what capacity alerts and
  * ingest-volume dashboards actually plot):
  *
  *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
  *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
  *   forecast_t = l_t + h·b_t
  *
  * Seeding: l_1 = x_1, b_1 = 0 (first observation carries no trend
  * evidence); on an exact linear series the recursion converges to
  * b = slope and the forecast to the true future value — spec-pinned.
  *
  * Two forms, pinned equal (HoltForecastSpec): the [[StatefulOps]]
  * batch shape (key-clustered shuffle + external partition sort,
  * O(1) streamed state, no group buffering) and a
  * `transformWithState` ValueState form (three numbers per key,
  * TTL-boundable) on the RocksDB provider.
  */
object HoltForecast {

  private def requireParams(alpha: Double, beta: Double, h: Int): Unit = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1); got $alpha")
    require(beta > 0 && beta < 1, s"beta must be in (0,1); got $beta")
    require(h >= 1, s"h (forecast horizon, steps) must be >= 1; got $h")
  }

  private def eventOrder(e: UserEvent) = (e.ts.getTime, e.event_id)

  private def step(st: HoltState, x: Double, alpha: Double,
      beta: Double): HoltState =
    if (st.seen == 0L) HoltState(x, 0.0, 1L)
    else {
      val l = alpha * x + (1 - alpha) * (st.level + st.trend)
      val b = beta * (l - st.level) + (1 - beta) * st.trend
      HoltState(l, b, st.seen + 1)
    }

  private def advance(st0: HoltState, alpha: Double, beta: Double,
      h: Int, events: Seq[UserEvent]): (Seq[HoltOut], HoltState) = {
    var st = st0
    val out = events.map { e =>
      st = step(st, e.value, alpha, beta)
      HoltOut(e.user_id, e.event_id, e.value, st.level, st.trend,
        st.level + h * st.trend)
    }
    (out, st)
  }

  /** Batch form: per-key Holt recursion as one streamed pass over a
    * key-clustered, time-ordered partition. */
  def holtBatch(ev: Dataset[UserEvent], alpha: Double = 0.3,
      beta: Double = 0.1, h: Int = 1): Dataset[HoltOut] = {
    requireParams(alpha, beta, h)
    implicit val outEnc = Encoders.product[HoltOut]
    ev.repartition(ev("user_id"))
      .sortWithinPartitions(ev("user_id"), ev("ts"), ev("event_id"))
      .mapPartitions { it =>
        var cur = Long.MinValue
        var st = HoltState(0.0, 0.0, 0L)
        it.map { e =>
          if (e.user_id != cur) { cur = e.user_id; st = HoltState(0.0, 0.0, 0L) }
          st = step(st, e.value, alpha, beta)
          HoltOut(e.user_id, e.event_id, e.value, st.level, st.trend,
            st.level + h * st.trend)
        }
      }
  }

  /** `transformWithState` form: three numbers of ValueState per key. */
  final class HoltProcessor(alpha: Double, beta: Double, h: Int,
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, UserEvent, HoltOut] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[HoltState] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[HoltState]("holtState",
        Encoders.product[HoltState], ttl)
    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[HoltOut] = {
      val st = if (state.exists()) state.get()
        else HoltState(0.0, 0.0, 0L)
      val (out, next) = advance(st, alpha, beta, h,
        rows.toSeq.sortBy(eventOrder))
      state.update(next)
      out.iterator
    }
  }

  /** Streaming Holt on `transformWithState` (RocksDB provider). */
  def holtTws(ev: Dataset[UserEvent], alpha: Double = 0.3,
      beta: Double = 0.1, h: Int = 1,
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      : Dataset[HoltOut] = {
    requireParams(alpha, beta, h)
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}
    implicit val outEnc = Encoders.product[HoltOut]
    implicit val keyEnc = Encoders.scalaLong
    val mode = if (ttl == TTLConfig.NONE) TimeMode.None()
      else TimeMode.ProcessingTime()
    ev.groupByKey(_.user_id)
      .transformWithState(new HoltProcessor(alpha, beta, h, ttl),
        mode, OutputMode.Append())
  }
}
