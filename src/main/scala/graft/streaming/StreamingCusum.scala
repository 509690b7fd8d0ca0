package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

final case class CusumState(pos: Double, neg: Double)
final case class CusumOut(user_id: Long, event_id: Long, value: Double,
    cusum_pos: Double, cusum_neg: Double, alert: Boolean)

/** Per-key CUSUM mean-shift detector — the sequential change detector
  * next to [[StreamingDrift]]'s distribution monitor: PSI sees a
  * reshaped histogram once a window closes; CUSUM pages on a small
  * persistent LEVEL shift within a handful of events, the failure mode
  * of a drifting sensor or a silently re-scaled upstream field.
  *
  * Classic two-sided tabular CUSUM against a FIXED batch reference
  * (μ, σ from [[reference]]'s DECIMAL-exact moments, baked into the
  * plan as literals — no join):
  *
  *   S⁺ ← max(0, S⁺ + (x − μ − kσ)),  S⁻ ← max(0, S⁻ + (μ − x − kσ))
  *
  * alert when either side exceeds hσ, then both sides reset (restart
  * semantics — repeated shifts re-page). Standard (k, h) = (0.5, 5):
  * tuned for ~1σ shifts with an in-control ARL in the hundreds.
  *
  * Two forms with pinned-equal semantics (StreamingCusumSpec):
  *  - [[cusumBatch]] — the [[StatefulOps.runningStats]] shape:
  *    key-clustered shuffle, external (spilling) partition sort,
  *    O(1) streamed state, zero group buffering — a hot key costs
  *    disk, never an executor OOM;
  *  - [[CusumProcessor]] on Spark 4's `transformWithState` (RocksDB
  *    state store): two doubles of ValueState per key, per-variable
  *    TTL bounding idle keys at an unbounded key space.
  */
object StreamingCusum {

  /** DECIMAL-exact (mean, stddev) of `valCol` on a batch reference
    * corpus — two doubles to the driver, baked as plan literals. */
  def reference(ref: DataFrame, valCol: String): (Double, Double) = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 6)
    val v = col(valCol)
    val r = ref.agg(count(lit(1)).cast("double").as("n"),
      sum(v.cast(dec)).cast("double").as("sx"),
      sum((v * v).cast(dec)).cast("double").as("sxx")).head()
    val (n, sx, sxx) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    (sx / n, math.sqrt(math.max((sxx - sx * sx / n) / (n - 1), 0.0)))
  }

  private def requireParams(sigma: Double, k: Double, h: Double): Unit = {
    require(sigma > 0, s"sigma must be positive; got $sigma")
    require(k >= 0, s"k (slack, in sigmas) must be >= 0; got $k")
    require(h > 0, s"h (threshold, in sigmas) must be positive; got $h")
  }

  private def eventOrder(e: UserEvent) = (e.ts.getTime, e.event_id)

  private def advance(st: CusumState, mu: Double, sigma: Double,
      k: Double, h: Double, events: Seq[UserEvent])
      : (Seq[CusumOut], CusumState) = {
    var pos = st.pos; var neg = st.neg
    val slack = k * sigma; val limit = h * sigma
    val out = events.map { e =>
      pos = math.max(0.0, pos + (e.value - mu - slack))
      neg = math.max(0.0, neg + (mu - e.value - slack))
      val alert = pos > limit || neg > limit
      val o = CusumOut(e.user_id, e.event_id, e.value, pos, neg, alert)
      if (alert) { pos = 0.0; neg = 0.0 } // restart: re-arm for the next shift
      o
    }
    (out, CusumState(pos, neg))
  }

  /** Batch form: per-key CUSUM as one streamed pass over a
    * key-clustered, time-ordered partition (no group buffering). */
  def cusumBatch(ev: Dataset[UserEvent], mu: Double, sigma: Double,
      k: Double = 0.5, h: Double = 5.0): Dataset[CusumOut] = {
    requireParams(sigma, k, h)
    implicit val outEnc = Encoders.product[CusumOut]
    val slack = k * sigma; val limit = h * sigma
    ev.repartition(ev("user_id"))
      .sortWithinPartitions(ev("user_id"), ev("ts"), ev("event_id"))
      .mapPartitions { it =>
        var cur = Long.MinValue
        var pos = 0.0
        var neg = 0.0
        it.map { e =>
          if (e.user_id != cur) { cur = e.user_id; pos = 0.0; neg = 0.0 }
          pos = math.max(0.0, pos + (e.value - mu - slack))
          neg = math.max(0.0, neg + (mu - e.value - slack))
          val alert = pos > limit || neg > limit
          val o = CusumOut(e.user_id, e.event_id, e.value, pos, neg,
            alert)
          if (alert) { pos = 0.0; neg = 0.0 }
          o
        }
      }
  }

  /** `transformWithState` form: two doubles of ValueState per key;
    * within a micro-batch events replay in (ts, event_id) order, so
    * cross-batch folds equal the batch form on watermark-clean input. */
  final class CusumProcessor(mu: Double, sigma: Double, k: Double,
      h: Double,
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, UserEvent, CusumOut] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[CusumState] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[CusumState]("cusumState",
        Encoders.product[CusumState], ttl)
    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[CusumOut] = {
      val st = if (state.exists()) state.get() else CusumState(0.0, 0.0)
      val (out, next) = advance(st, mu, sigma, k, h,
        rows.toSeq.sortBy(eventOrder))
      state.update(next)
      out.iterator
    }
  }

  /** Streaming CUSUM on `transformWithState` (RocksDB provider — see
    * [[StateStores]]). A finite `ttl` expires idle keys' two-double
    * state, the knob for unbounded key spaces at 100 TB. */
  def cusumTws(ev: Dataset[UserEvent], mu: Double, sigma: Double,
      k: Double = 0.5, h: Double = 5.0,
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      : Dataset[CusumOut] = {
    requireParams(sigma, k, h)
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}
    implicit val outEnc = Encoders.product[CusumOut]
    implicit val keyEnc = Encoders.scalaLong
    val mode = if (ttl == TTLConfig.NONE) TimeMode.None()
      else TimeMode.ProcessingTime()
    ev.groupByKey(_.user_id)
      .transformWithState(new CusumProcessor(mu, sigma, k, h, ttl),
        mode, OutputMode.Append())
  }
}
