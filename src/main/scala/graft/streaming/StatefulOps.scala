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
  * Scale note: state is one small case class per key, the same bound a
  * streaming deployment's state store carries; the batch form sorts one
  * key's events in memory (bounded by the per-key event count, not the
  * corpus). Typed `Encoder`s keep rows in Tungsten format off-heap.
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

  /** Batch form: per-key custom state via typed `flatMapGroups`. */
  def runningStats(ev: Dataset[UserEvent]): Dataset[RunOut] = {
    implicit val outEnc = Encoders.product[RunOut]
    implicit val keyEnc = Encoders.scalaLong
    ev.groupByKey(_.user_id)
      .flatMapGroups { (_: Long, it: Iterator[UserEvent]) =>
        advance(0L, Double.NegativeInfinity,
          it.toSeq.sortBy(eventOrder))._1.iterator
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
