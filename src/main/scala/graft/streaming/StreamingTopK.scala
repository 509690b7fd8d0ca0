package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

final case class KeyedToken(key: String, token: String, ts: java.sql.Timestamp,
    seq: Long)
final case class TopKEntry(token: String, count: Long, error: Long)
final case class TopKState(entries: Seq[TopKEntry])
final case class TopKOut(key: String, token: String, est_count: Long,
    max_error: Long)

/** Per-key Space-Saving heavy hitters (Metwally et al. 2005) — the
  * STREAMING twin of the batch `topk_tokens_approx` sketch: "what's
  * trending per category right now" with HARD bounded state (m
  * counters per key, ~m·(token + 2 longs)), regardless of how many
  * distinct tokens flow through. The deterministic guarantees, asserted
  * in StreamingTopKSpec:
  *
  *   true_count ≤ est_count           (never undercounts)
  *   est_count − max_error ≤ true_count (the error bound is honest)
  *   any item with true_count > N/m is tracked (heavy hitters survive)
  *
  * Update: a tracked token increments; an untracked token evicts the
  * MIN-count entry (count tiebreak → lexicographic token, so replay
  * order is the only ordering dependence) and inherits its count as
  * `error` + 1. Determinism: within a micro-batch, rows replay in
  * (ts, seq) order — the StreamingCusum stance.
  *
  * Two forms with pinned-equal semantics on watermark-clean input:
  *  - [[topkBatch]]: key-clustered shuffle + external partition sort,
  *    one streamed pass, O(m) state per key in flight;
  *  - [[TopKProcessor]] on `transformWithState` (RocksDB): one
  *    ValueState[TopKState] per key, TTL for unbounded key spaces.
  *
  * Scale: state is m counters PER KEY — the whole point. The emitted
  * rows per trigger are ≤ k per key (the current board, Complete-mode
  * friendly); the unbounded-distinct-token memory cliff of an exact
  * groupBy never exists.
  */
object StreamingTopK {

  private def order(t: KeyedToken) = (t.ts.getTime, t.seq)

  /** One Space-Saving update pass; entries are an UNORDERED Seq —
    * eviction picks the min by `minBy` and the emitting board sorts —
    * and m is small (≤ 256), so a linear scan beats hash churn. */
  private[streaming] def advance(st: TopKState, m: Int,
      tokens: Seq[String]): TopKState = {
    var entries = st.entries
    tokens.foreach { tok =>
      entries.indexWhere(_.token == tok) match {
        case -1 if entries.size < m =>
          entries = entries :+ TopKEntry(tok, 1L, 0L)
        case -1 =>
          // evict the min-count entry (lexicographic token tiebreak)
          val victim = entries.minBy(e => (e.count, e.token))
          entries = entries.filterNot(_ eq victim) :+
            TopKEntry(tok, victim.count + 1L, victim.count)
        case i =>
          val e = entries(i)
          entries = entries.updated(i, e.copy(count = e.count + 1L))
      }
    }
    TopKState(entries)
  }

  private[streaming] def board(key: String, st: TopKState, k: Int)
      : Seq[TopKOut] =
    st.entries.sortBy(e => (-e.count, e.token)).take(k)
      .map(e => TopKOut(key, e.token, e.count, e.error))

  /** Batch form: per-key Space-Saving as one streamed pass over a
    * key-clustered, ordered partition; emits the final ≤k board per
    * key. Exact-equality twin of the TWS processor on the same input
    * order. */
  def topkBatch(ds: Dataset[KeyedToken], m: Int, k: Int)
      : Dataset[TopKOut] = {
    require(m >= 1 && m <= 256, s"m must be in [1, 256]; got $m")
    require(k >= 1 && k <= m, s"k must be in [1, m]; got $k")
    implicit val outEnc = Encoders.product[TopKOut]
    ds.repartition(ds("key"))
      .sortWithinPartitions(ds("key"), ds("ts"), ds("seq"))
      .mapPartitions { it =>
        new Iterator[Seq[TopKOut]] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): Seq[TopKOut] = {
            val key = buf.head.key
            var st = TopKState(Nil)
            while (buf.hasNext && buf.head.key == key) {
              // rows arrive ordered; advance one at a time keeps the
              // streamed O(m) state without buffering the group
              st = advance(st, m, Seq(buf.next().token))
            }
            board(key, st, k)
          }
        }.flatten
      }
  }

  /** `transformWithState` form: one TopKState per key; each trigger
    * folds its rows in (ts, seq) order and emits the key's refreshed
    * ≤k board (downstream dedups on key+token, or treats each trigger
    * as the current leaderboard). */
  final class TopKProcessor(m: Int, k: Int,
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, KeyedToken, TopKOut] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[TopKState] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TopKState]("topkState",
        Encoders.product[TopKState], ttl)
    override def handleInputRows(key: String,
        rows: Iterator[KeyedToken],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TopKOut] = {
      val st = if (state.exists()) state.get() else TopKState(Nil)
      val next = advance(st, m, rows.toSeq.sortBy(order).map(_.token))
      state.update(next)
      board(key, next, k).iterator
    }
  }

  /** Streaming Space-Saving on `transformWithState` (RocksDB — see
    * [[StateStores]]); finite `ttl` expires idle keys' board. */
  def topkTws(ds: Dataset[KeyedToken], m: Int, k: Int,
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      : Dataset[TopKOut] = {
    require(m >= 1 && m <= 256, s"m must be in [1, 256]; got $m")
    require(k >= 1 && k <= m, s"k must be in [1, m]; got $k")
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}
    implicit val outEnc = Encoders.product[TopKOut]
    implicit val keyEnc = Encoders.STRING
    val mode = if (ttl == TTLConfig.NONE) TimeMode.None()
      else TimeMode.ProcessingTime()
    ds.groupByKey(_.key)
      .transformWithState(new TopKProcessor(m, k, ttl), mode,
        OutputMode.Append())
  }
}
