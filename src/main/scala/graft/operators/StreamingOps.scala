package graft.operators

import graft.Query
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Tier C — streaming-semantics operators (SURVEY.md §2.3 Tier C).
  *
  * The reference is a stream processor (BME680.java:223-229); Structured
  * Streaming runs these same plans incrementally (graft.streaming). Batch
  * analogs over `events.ts` are declared here so the DuckDB oracle can
  * gate them; the true streaming forms (watermarks, MemoryStream
  * choreography) are exercised in StreamingSpec.
  *
  * Scale notes: time-window aggregation shuffles once on (window, key) —
  * partial aggregation happens map-side, so 100 TB of events reduces to
  * |windows|×|keys| rows before the exchange. The session-window batch
  * analog is a per-user sort within the user_id shuffle partition (the
  * same layout Structured Streaming's state store keeps); dedup is the
  * same shuffle with a partition-local row_number.
  */
object StreamingOps {

  val all: Seq[Query] = Seq(
    // Stream-stream interval join (batch analog): purchases within two
    // hours of a view by the same user. The join key is the EQUI user_id
    // — the time bound is a residual predicate, so the plan is a hash
    // join keyed on user_id at any scale, never a nested loop; the true
    // streaming form (two watermarked streams, state bounded by the
    // interval condition) runs in StreamingSpec.
    Query(
      "q_stream_join",
      Some("""SELECT a.user_id, a.event_id AS view_id,
                     b.event_id AS purchase_id
              FROM events a JOIN events b
                ON a.user_id = b.user_id
               AND a.event_type = 'view' AND b.event_type = 'purchase'
               AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 120 MINUTE
              ORDER BY view_id, purchase_id"""),
      (s, d) => {
        val ev = Tables.events(s, d)
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"),
            col("ts").as("vts"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("b_user"),
            col("event_id").as("purchase_id"), col("ts").as("bts"))
        views.join(buys,
            col("user_id") === col("b_user") &&
            col("bts") >= col("vts") &&
            col("bts") <= col("vts") + expr("INTERVAL 120 MINUTES"))
          .select(col("user_id"), col("view_id"), col("purchase_id"))
          .orderBy("view_id", "purchase_id")
      }),

    // Typed custom state (mapGroupsWithState surface): running per-user
    // sequence + max via flatMapGroups — the batch twin of the
    // flatMapGroupsWithState streaming form (StreamingSpec proves state
    // carries across micro-batches). Oracle: SQL window functions.
    Query(
      "q_stateful_running",
      Some("""SELECT user_id, event_id,
                     CAST(row_number() OVER w AS BIGINT) AS seq,
                     max(value) OVER w AS run_max
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING)
              ORDER BY user_id, seq"""),
      (s, d) => {
        import s.implicits._
        graft.streaming.StatefulOps.runningStats(
            Tables.events(s, d)
              .select("user_id", "event_id", "ts", "value")
              .as[graft.streaming.UserEvent])
          .toDF()
          .orderBy("user_id", "seq")
      }),

    // Tumbling 1-hour windows, epoch-aligned in both engines (Spark
    // window() and DuckDB time_bucket() both align to multiples of the
    // interval since a common origin for hour-divisible intervals).
    Query(
      "q_window_tumbling",
      Some("""SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win_start,
                     event_type, count(*) AS n,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
              FROM events
              GROUP BY 1, 2 ORDER BY win_start, event_type"""),
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).cast("double")
              .as("sum_v"))
          .select(
            col("window.start").as("win_start"), col("event_type"),
            col("n"), col("sum_v"))
          .orderBy("win_start", "event_type")),

    // Sliding 1-hour window, 15-minute slide: every event lands in
    // exactly 4 windows. The oracle expands each event into its 4
    // containing windows via a small range join — same multiset.
    Query(
      "q_window_sliding",
      Some("""SELECT time_bucket(INTERVAL 15 MINUTE, ts)
                       - k.k * INTERVAL 15 MINUTE AS win_start,
                     event_type, count(*) AS n
              FROM events CROSS JOIN range(0, 4) k(k)
              GROUP BY 1, 2 ORDER BY win_start, event_type"""),
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour", "15 minutes"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(
            col("window.start").as("win_start"), col("event_type"), col("n"))
          .orderBy("win_start", "event_type")),

    // Per-user sessions with a 30-minute inactivity gap. Spark's
    // session_window merges an event arriving EXACTLY gap after the
    // previous one (per-event windows [ts, ts+gap) merge when they touch
    // — verified empirically on 4.1.2, batch and streaming agree), so
    // the gaps-and-islands oracle flags a new session only at
    // diff > 30 min, strictly. Session duration = last-event −
    // first-event (window.end includes the trailing gap, subtracted
    // here). Boundary fixture: StreamingSpec "session window boundary".
    Query(
      "q_window_session",
      Some("""WITH g AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
              s AS (
                SELECT user_id, ts,
                       SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS sid
                FROM g)
              SELECT user_id, min(ts) AS session_start,
                     count(*) AS n_events,
                     CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS dur_us
              FROM s GROUP BY user_id, sid
              ORDER BY user_id, session_start"""),
      (s, d) =>
        Tables.events(s, d)
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(
            col("user_id"),
            col("session_window.start").as("session_start"),
            col("n_events"),
            (unix_micros(col("session_window.end"))
              - unix_micros(col("session_window.start"))
              - lit(30L * 60 * 1000000)).as("dur_us"))
          .orderBy("user_id", "session_start")),

    // First event per (user_id, event_type) — the batch analog of
    // streaming dropDuplicates-with-watermark. Deterministic tiebreak on
    // event_id.
    Query(
      "q_dedup",
      Some("""SELECT event_id, user_id, event_type, ts FROM events
              QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1
              ORDER BY user_id, event_type"""),
      (s, d) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("event_id", "user_id", "event_type", "ts")
          .orderBy("user_id", "event_type")
      }),

    // Running per-user totals — the batch rendering of an update-mode
    // streaming aggregation: state after every event.
    Query(
      "q_stream_agg",
      Some("""SELECT event_id, user_id,
                     CAST(count(*) OVER w AS BIGINT) AS n_so_far,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS total_so_far
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING)
              ORDER BY event_id"""),
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(
            col("event_id"), col("user_id"),
            count(lit(1)).over(w).as("n_so_far"),
            sum(col("value").cast(DecimalType(18, 2))).over(w)
              .cast("double").as("total_so_far"))
          .orderBy("event_id")
      })
  )
}
