package graft

import scala.jdk.CollectionConverters._

import graft.streaming._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import java.nio.file.Files
import java.sql.Timestamp

/** Provider-parametrized stateful streaming gate (VERDICT r10 item 1):
  * every stateful family — windowed agg + watermark late-drop
  * (q_stream_agg / s_watermark_late), custom state via
  * `flatMapGroupsWithState` (q_stateful_running's streaming form),
  * streaming dedup filters (StreamingDedup), and the stream-stream
  * interval join — runs under BOTH state-store providers and must
  * produce IDENTICAL results:
  *
  *  - `HDFSBackedStateStoreProvider` — Spark's in-heap default;
  *  - `RocksDBStateStoreProvider` — the off-heap provider the 100 TB
  *    state story requires (see [[graft.streaming.StateStores]]).
  *
  * Each provider runs in its own `newSession` (isolated SQLConf over
  * the shared context), mirroring how a production job selects the
  * provider — a session conf, zero operator-code changes. The RocksDB
  * runs additionally assert the provider ENGAGED (rocksdb* entries in
  * the state operator's custom metrics), so a conf typo can't pass as
  * a silent fall-through to the default provider.
  */
class StateStoreSpec extends SparkSpec {

  private def ts(min: Int) = new Timestamp(min * 60000L)
  private def tmpCkpt(): String =
    Files.createTempDirectory("graft_ckpt_").toString

  private def sessions(): Seq[(String, SparkSession)] = Seq(
    "HDFSBacked" -> StateStores.sessionWithProvider(
      spark, StateStores.DefaultProvider),
    "RocksDB" -> StateStores.rocksDBSession(spark))

  /** Union of state-operator custom-metric names across the run. */
  private def stateMetricKeys(q: StreamingQuery): Set[String] =
    q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
      .flatMap(_.customMetrics.keySet().asScala).toSet

  private def assertEngaged(label: String, q: StreamingQuery): Unit =
    if (label == "RocksDB") {
      val keys = stateMetricKeys(q)
      assert(keys.exists(_.startsWith("rocksdb")),
        s"expected rocksdb* state metrics, got: $keys")
    }

  test("windowed agg + watermark late-drop: identical under both providers") {
    val results = sessions().map { case (label, s) =>
      import s.implicits._
      val in = MemoryStream[(Timestamp, String)](s)
      val name = s"ss_agg_${label}_${System.nanoTime()}"
      val q = in.toDF().toDF("ts", "k")
        .withWatermark("ts", "10 minutes")
        .groupBy(window($"ts", "10 minutes"), $"k")
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").option("checkpointLocation", tmpCkpt()).start()
      in.addData((ts(1), "a"), (ts(2), "a"), (ts(5), "b")) // window [0,10)
      q.processAllAvailable()
      in.addData((ts(60), "c")) // watermark → 50 min; [0,10) finalizes
      q.processAllAvailable()
      in.addData((ts(3), "a")) // LATE: inside closed [0,10) — dropped
      q.processAllAvailable()
      val out = s.table(name).select($"k", $"n")
        .as[(String, Long)].collect().sorted.toSeq
      assertEngaged(label, q)
      q.stop()
      label -> out
    }
    results.foreach { case (label, out) =>
      assert(out === Seq(("a", 2L), ("b", 1L)), s"provider $label")
    }
  }

  test("flatMapGroupsWithState running stats: cross-batch state identical " +
      "under both providers and equal to the batch form") {
    // the batch (oracle-gated q_stateful_running) form on the union is
    // the ground truth for the streaming state machine
    val ev = Seq(
      UserEvent(1L, 10L, ts(1), 5.0), UserEvent(2L, 40L, ts(1), 1.0),
      UserEvent(1L, 11L, ts(2), 3.0), UserEvent(1L, 12L, ts(3), 7.0))
    val results = sessions().map { case (label, s) =>
      import s.implicits._
      val in = MemoryStream[UserEvent](s)
      val name = s"ss_run_${label}_${System.nanoTime()}"
      val q = StatefulOps.runningStatsStream(in.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").option("checkpointLocation", tmpCkpt()).start()
      in.addData(ev(0), ev(1)) // batch 1: first event of users 1 and 2
      q.processAllAvailable()
      in.addData(ev(2), ev(3)) // batch 2: user 1 continues — state reload
      q.processAllAvailable()
      val out = s.table(name).as[RunOut].collect()
        .sortBy(r => (r.user_id, r.seq)).toSeq
      assertEngaged(label, q)
      q.stop()
      label -> out
    }
    val expected = {
      import spark.implicits._
      StatefulOps.runningStats(ev.toDS())
        .collect().sortBy(r => (r.user_id, r.seq)).toSeq
    }
    assert(expected.map(r => (r.user_id, r.event_id, r.seq, r.run_max)) ===
      Seq((1L, 10L, 1L, 5.0), (1L, 11L, 2L, 5.0), (1L, 12L, 3L, 7.0),
        (2L, 40L, 1L, 1.0)))
    results.foreach { case (label, out) =>
      assert(out === expected, s"provider $label diverges from batch form")
    }
  }

  test("streaming exact-dup filter: cross-batch dedup state identical " +
      "under both providers") {
    val results = sessions().map { case (label, s) =>
      import s.implicits._
      val in = MemoryStream[(Timestamp, Long, String)](s)
      val name = s"ss_dd_${label}_${System.nanoTime()}"
      val q = StreamingDedup.exactDupFilter(
          in.toDF().toDF("ts", "id", "text"), "text", "ts", "10 minutes")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").option("checkpointLocation", tmpCkpt()).start()
      in.addData((ts(1), 1L, "Hello World"))
      q.processAllAvailable()
      // batch 2's normalized duplicate of batch 1's doc must hit STORED
      // state — the cross-batch read path the provider owns
      in.addData((ts(2), 2L, "  hello world  "), (ts(3), 3L, "hello worlds"))
      q.processAllAvailable()
      val kept = s.table(name).select($"id").as[Long].collect().sorted.toSeq
      assertEngaged(label, q)
      q.stop()
      label -> kept
    }
    results.foreach { case (label, kept) =>
      assert(kept === Seq(1L, 3L), s"provider $label")
    }
  }

  test("streaming near-dup filter: minhash signature state identical " +
      "under both providers") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val results = sessions().map { case (label, s) =>
      import s.implicits._
      val in = MemoryStream[(Timestamp, Long, String)](s)
      val name = s"ss_nd_${label}_${System.nanoTime()}"
      val q = StreamingDedup.nearDupFilter(
          in.toDF().toDF("ts", "id", "text"), "text", "ts", "10 minutes")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").option("checkpointLocation", tmpCkpt()).start()
      in.addData((ts(1), 1L, base))
      q.processAllAvailable()
      in.addData((ts(2), 2L, base), // cross-batch exact dup → dropped
        (ts(3), 3L, "completely different content here entirely"))
      q.processAllAvailable()
      val kept = s.table(name).select($"id").as[Long].collect().sorted.toSeq
      assertEngaged(label, q)
      q.stop()
      label -> kept
    }
    results.foreach { case (label, kept) =>
      assert(kept === Seq(1L, 3L), s"provider $label")
    }
  }

  test("stream-stream left-outer interval join: buffered-state null-pad " +
      "identical under both providers") {
    val results = sessions().map { case (label, s) =>
      import s.implicits._
      val views = MemoryStream[(Timestamp, Long, Long)](s)
      val buys = MemoryStream[(Timestamp, Long, Long)](s)
      val name = s"ss_oj_${label}_${System.nanoTime()}"
      val v = views.toDF().toDF("vts", "user_id", "view_id")
        .withWatermark("vts", "5 minutes")
      val b = buys.toDF().toDF("bts", "b_user", "purchase_id")
        .withWatermark("bts", "5 minutes")
      val q = v.join(b,
          expr("""user_id = b_user AND
                  bts >= vts AND bts <= vts + INTERVAL 10 MINUTES"""),
          "left_outer")
        .select($"view_id", $"purchase_id")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").option("checkpointLocation", tmpCkpt()).start()
      views.addData((ts(1), 7L, 1L), (ts(2), 8L, 2L))
      buys.addData((ts(5), 7L, 100L))
      q.processAllAvailable()
      // advance both watermarks past view 2's interval → null-pad
      views.addData((ts(60), 9L, 3L))
      buys.addData((ts(60), 8L, 101L))
      q.processAllAvailable()
      val out = s.table(name).select($"view_id", $"purchase_id")
        .as[(Long, Option[Long])].collect().toSet
      assertEngaged(label, q)
      q.stop()
      label -> out
    }
    results.foreach { case (label, out) =>
      assert(out.contains((1L, Some(100L))), s"provider $label: $out")
      assert(out.contains((2L, None)), s"provider $label: $out")
    }
    assert(results.map(_._2).distinct.size === 1,
      "providers diverge on the interval join")
  }

  test("transformWithState running stats (RocksDB-only operator): " +
      "cross-batch ValueState equal to the fMGWS and batch forms") {
    val ev = Seq(
      UserEvent(1L, 10L, ts(1), 5.0), UserEvent(2L, 40L, ts(1), 1.0),
      UserEvent(1L, 11L, ts(2), 3.0), UserEvent(1L, 12L, ts(3), 7.0))
    val s = StateStores.rocksDBSession(spark)
    import s.implicits._
    val in = MemoryStream[UserEvent](s)
    val name = s"ss_tws_${System.nanoTime()}"
    val q = StatefulOps.runningStatsTws(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", tmpCkpt()).start()
    in.addData(ev(0), ev(1))
    q.processAllAvailable()
    in.addData(ev(2), ev(3)) // user 1 continues — ValueState reload
    q.processAllAvailable()
    val out = s.table(name).as[RunOut].collect()
      .sortBy(r => (r.user_id, r.seq)).toSeq
    assertEngaged("RocksDB", q)
    q.stop()
    val expected = {
      import spark.implicits._
      StatefulOps.runningStats(ev.toDS())
        .collect().sortBy(r => (r.user_id, r.seq)).toSeq
    }
    assert(out === expected, "transformWithState diverges from batch form")
  }

  test("transformWithState recursive EWMA: one double of state per " +
      "key, cross-batch fold equal to the batch form, and after a " +
      "window of rows it converges to the bounded-window q_ewma") {
    val ev = (0 until 30).map(i =>
      UserEvent(1L + i % 2, 100L + i, ts(i + 1),
        if (i % 5 == 0) 10.0 else 2.0))
    val s = StateStores.rocksDBSession(spark)
    import s.implicits._
    val in = MemoryStream[UserEvent](s)
    val name = s"ss_ewma_${System.nanoTime()}"
    val q = StatefulOps.ewmaTws(in.toDS(), alpha = 0.3)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", tmpCkpt()).start()
    in.addData(ev.take(11): _*)   // uneven micro-batch split
    q.processAllAvailable()
    in.addData(ev.drop(11): _*)
    q.processAllAvailable()
    val out = s.table(name).as[EwmaOut].collect()
      .sortBy(r => (r.user_id, r.event_id)).toSeq
    assertEngaged("RocksDB", q)
    q.stop()
    val batch = {
      import spark.implicits._
      StatefulOps.ewmaBatch(ev.toDS(), alpha = 0.3)
        .collect().sortBy(r => (r.user_id, r.event_id)).toSeq
    }
    assert(out.map(_.user_id) === batch.map(_.user_id))
    out.zip(batch).foreach { case (a, b) =>
      assert(a.event_id === b.event_id &&
        math.abs(a.ewma - b.ewma) < 1e-12, s"$a vs $b")
    }
    // convergence to the batch tier's bounded-window normalized form:
    // by the last row of each key (15 rows deep), the truncated-tail
    // and seeding differences are < (1-α)^14 of the value range
    val bounded = {
      import spark.implicits._
      graft.operators.EventOps.ewma(ev.toDS().toDF(),
          "user_id", "ts", "event_id", "value", alpha = 0.3, span = 20)
        .collect().map(r => (r.getLong(0), r.getDouble(4))).toMap
    }
    val lastPerKey = out.groupBy(_.user_id).view
      .mapValues(_.maxBy(_.event_id)).toMap
    lastPerKey.foreach { case (_, o) =>
      assert(math.abs(o.ewma - bounded(o.event_id)) < 8.0 * 0.05,
        s"recursive ${o.ewma} vs bounded ${bounded(o.event_id)}")
    }
  }

  test("transformWithState EVENT-TIME TIMERS: sessions close by " +
      "in-stream gap-out AND by watermark timer for idle keys, " +
      "identically under both providers") {
    val gap = 5 * 60000L
    val expectedClosed = Set(
      // user 1 session A: closed IN-STREAM by its own later event
      // arriving past the gap
      (1L, ts(1).getTime, ts(2).getTime, 2L, 5.0),
      // user 2: single event, no successor — only the TIMER can close
      // it (watermark passes 1min + gap once later data arrives)
      (2L, ts(1).getTime, ts(1).getTime, 1L, 1.0),
      // user 1 session B: closed by its re-armed timer
      (1L, ts(30).getTime, ts(30).getTime, 1L, 4.0),
      // user 3: closed by timer once the watermark reaches 45min
      (3L, ts(40).getTime, ts(40).getTime, 1L, 9.0))
    // the both-provider surface is fMGWS + EventTimeTimeout; the TWS
    // timer runs where Spark supports it (RocksDB — see the fail-fast
    // case below)
    val runs: Seq[(String, SparkSession,
        org.apache.spark.sql.Dataset[UserEvent] =>
          org.apache.spark.sql.Dataset[SessionOut])] =
      sessions().map { case (label, s) =>
        (s"fMGWS-$label", s,
          (ds: org.apache.spark.sql.Dataset[UserEvent]) =>
            StatefulOps.sessionizeStream(ds, gapMs = gap))
      } :+ (("TWS-RocksDB", StateStores.rocksDBSession(spark),
        (ds: org.apache.spark.sql.Dataset[UserEvent]) =>
          StatefulOps.sessionizeTws(ds, gapMs = gap)))
    val results = runs.map { case (label, s, mk) =>
      import s.implicits._
      val in = MemoryStream[UserEvent](s)
      val name = s"ss_timer_${label.replace("-", "_")}_${System.nanoTime()}"
      val q = mk(in.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tmpCkpt()).start()
      // batch 1: user 1 opens a session (1, 2 min); user 2 one event
      in.addData(UserEvent(1L, 10L, ts(1), 2.0),
        UserEvent(1L, 11L, ts(2), 3.0), UserEvent(2L, 20L, ts(1), 1.0))
      q.processAllAvailable()
      // batch 2: user 1 jumps past the gap — session A closes
      // in-stream, session B opens, timer re-arms to 35 min
      in.addData(UserEvent(1L, 12L, ts(30), 4.0))
      q.processAllAvailable()
      // batch 3: unrelated key advances the watermark to 40 min —
      // user 2's timer (6 min) fires
      in.addData(UserEvent(3L, 30L, ts(40), 9.0))
      q.processAllAvailable()
      // batch 4: watermark to 60 min — user 1's re-armed timer
      // (35 min) and user 3's (45 min) fire; user 4 stays OPEN
      in.addData(UserEvent(4L, 40L, ts(60), 8.0))
      q.processAllAvailable()
      val out = s.table(name).as[SessionOut].collect()
        .map(o => (o.user_id, o.start_ms, o.end_ms, o.n_events,
          o.sum_value)).toSet
      if (label.endsWith("RocksDB")) assertEngaged("RocksDB", q)
      q.stop()
      assert(out === expectedClosed, s"[$label] closed sessions")
      label -> out
    }
    assert(results.map(_._2).distinct.size === 1,
      "providers and operators must agree bit-for-bit")
  }

  test("transformWithState on the HDFSBacked provider fails FAST with " +
      "the multiple-column-families error — the documented reason the " +
      "TWS timer surface is RocksDB-only") {
    val s = StateStores.sessionWithProvider(spark,
      StateStores.DefaultProvider)
    import s.implicits._
    val in = MemoryStream[UserEvent](s)
    val q = StatefulOps.sessionizeTws(in.toDS(), gapMs = 60000L)
      .writeStream.format("memory")
      .queryName(s"ss_timer_ff_${System.nanoTime()}")
      .outputMode("append").option("checkpointLocation", tmpCkpt())
      .start()
    in.addData(UserEvent(1L, 1L, ts(1), 1.0))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    assert(e.getMessage.contains("STATE_STORE_MULTIPLE_COLUMN_FAMILIES"),
      e.getMessage.take(300))
    q.stop()
  }

  test("checkpoint restart: a NEW query resumes per-key state from the " +
      "same checkpoint under both providers (RocksDB via changelog)") {
    // In-flight state coverage exists (state across micro-batches in a
    // live query); this pins the RESTART path — stop, construct a new
    // query over the same checkpoint dir, and the per-key state machine
    // must continue (seq resumes, running max remembered), not reset.
    // Under RocksDB this reloads SST+changelog; under HDFSBacked, the
    // delta snapshot chain.
    val results = sessions().map { case (label, s) =>
      import s.implicits._
      val in = MemoryStream[UserEvent](s)
      val ckpt = tmpCkpt()
      // the memory sink refuses checkpoint recovery; a foreachBatch
      // collector is the restart-capable test sink
      val sunk = new java.util.concurrent.ConcurrentLinkedQueue[RunOut]()
      def start() = StatefulOps.runningStatsStream(in.toDS())
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[RunOut], _: Long) =>
          df.collect().foreach(sunk.add)
        }
        .outputMode("append").option("checkpointLocation", ckpt).start()
      val q1 = start()
      in.addData(UserEvent(1L, 10L, ts(1), 50.0),
        UserEvent(1L, 11L, ts(2), 80.0))
      q1.processAllAvailable()
      val before = sunk.asScala
        .map(r => r.event_id -> ((r.seq, r.run_max))).toMap
      q1.stop()
      sunk.clear()
      // NEW query object, same checkpoint: state must resume, and the
      // already-committed batch must not replay into the new sink
      val q2 = start()
      in.addData(UserEvent(1L, 12L, ts(3), 60.0))
      q2.processAllAvailable()
      val after = sunk.asScala
        .map(r => r.event_id -> ((r.seq, r.run_max))).toMap
      assertEngaged(label, q2)
      q2.stop()
      assert(before === Map(10L -> ((1L, 50.0)), 11L -> ((2L, 80.0))),
        s"provider $label pre-restart")
      label -> after
    }
    results.foreach { case (label, after) =>
      // seq continues at 3 and the pre-restart running max (80.0)
      // survived the restart; committed events 10/11 did not replay
      assert(after === Map(12L -> ((3L, 80.0))),
        s"provider $label post-restart state: $after")
    }
  }

  test("transformWithState per-variable TTL: idle key state expires and " +
      "the running stats reset (the unbounded-key-space bound)") {
    val s = StateStores.rocksDBSession(spark)
    import s.implicits._
    val in = MemoryStream[UserEvent](s)
    val name = s"ss_ttl_${System.nanoTime()}"
    val q = StatefulOps.runningStatsTws(in.toDS(),
        org.apache.spark.sql.streaming.TTLConfig(
          java.time.Duration.ofMillis(300)))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", tmpCkpt()).start()
    // NOTE: no processAllAvailable here — under TimeMode.ProcessingTime
    // the micro-batch loop never goes idle (timer/TTL sweeps keep it
    // busy), so processAllAvailable blocks forever; poll the sink with
    // a deadline instead.
    def awaitRows(n: Int): Map[Long, (Long, Double)] = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var out = Map.empty[Long, (Long, Double)]
      while (out.size < n && System.nanoTime() < deadline) {
        Thread.sleep(200)
        out = s.table(name).as[RunOut].collect()
          .map(r => r.event_id -> ((r.seq, r.run_max))).toMap
      }
      out
    }
    in.addData(UserEvent(1L, 10L, ts(1), 80.0))
    assert(awaitRows(1).size === 1)
    // let the 300 ms TTL lapse with a margin, then touch the key again:
    // the expired ValueState must read as absent — seq restarts at 1
    // and the pre-expiry running max (80.0) is forgotten
    Thread.sleep(1500)
    in.addData(UserEvent(1L, 11L, ts(2), 40.0))
    val out = awaitRows(2)
    q.stop()
    assert(out(10L) === ((1L, 80.0)))
    assert(out(11L) === ((1L, 40.0)), s"state survived its TTL: $out")
  }

  test("statestore reader: checkpointed streaming state is inspectable " +
    "as a DataFrame under both providers") {
    // the Spark 4 state data source — the ops surface for debugging a
    // live pipeline's keyed state without instrumenting the query
    sessions().foreach { case (label, s) =>
      import s.implicits._
      val in = MemoryStream[(String, Long)](s)
      val ckpt = tmpCkpt()
      val name = s"ss_reader_${label}_${System.nanoTime()}"
      val q = in.toDF().toDF("k", "v")
        .groupBy("k")
        .agg(count(lit(1)).as("n"), sum($"v").as("s"))
        .writeStream.format("memory").queryName(name)
        .outputMode("update").option("checkpointLocation", ckpt).start()
      in.addData(("a", 1L), ("a", 2L), ("b", 10L))
      q.processAllAvailable()
      in.addData(("a", 4L), ("c", 100L))
      q.processAllAvailable()
      q.stop()
      val state = s.read.format("statestore").load(ckpt)
      // key is a struct of the grouping cols; value carries the agg
      // buffer under Spark's INTERNAL buffer-attribute names
      // ("count"/"sum" for Count/Sum) — not a public contract, so a
      // Spark upgrade renaming them fails here with an
      // unresolved-field error, which is this pin doing its job
      val rows = state.select($"key".getField("k").as("k"),
          $"value".getField("count").as("n"),
          $"value".getField("sum").as("s"))
        .as[(String, Long, Long)].collect().toSet
      assert(rows === Set(("a", 3L, 7L), ("b", 1L, 10L), ("c", 1L, 100L)),
        s"provider $label read back $rows")
    }
  }
}
