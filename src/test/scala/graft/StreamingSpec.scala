package graft

import graft.streaming._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import java.sql.Timestamp

/** Streaming tier (SURVEY.md §5.3) — the TopologyTestDriver-equivalent:
  * MemoryStream choreography over the same Pipelines used in batch.
  * Covers the reference fan-out (R2/R3), the MQTT-shaped sink's
  * log-and-drop QoS0 semantics (R10), and the streaming-state operators
  * the reference lacks (watermark late-drop, dedup, session windows).
  */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def tmpCkpt(): String =
    Files.createTempDirectory("graft_ckpt_").toString

  private val sampleDoc = """{"uuid":"x1","bme680_tempf":"82.74"}"""

  test("fan-out: pass-through sees ALL records, alerts only >75 (R2/R3)") {
    val in = MemoryStream[(String, String)](spark)
    in.addData(("k1", sampleDoc), ("k2", """{"bme680_tempf":"60.0"}"""),
      ("k3", " 80.1 "), ("k4", "70"), ("k5", "not-a-number"))
    val runId = s"fanout_${System.nanoTime()}"
    val (pass, alerts) = AlertStreamJob.start(
      in.toDF().toDF("key", "value"), "bme680warning",
      () => new CollectingPublisher(runId), tmpCkpt())
    pass.awaitTermination(); alerts.awaitTermination()

    // pass-through: every ORIGINAL record, unmodified (BME680.java:227)
    val passed = spark.table(pass.name).as[(String, String)].collect().toMap
    assert(passed.size === 5 && passed("k5") === "not-a-number")

    // alert branch: strict >75 only, Formatter-exact text, QoS0 retained
    val msgs = CollectingPublisher.messages(runId)
    assert(msgs.map(_.payload).sorted ===
      Seq("Temperature warning 80.10", "Temperature warning 82.74"))
    assert(msgs.forall(m =>
      m.topic == "bme680warning" && m.qos == 0 && m.retained))
    CollectingPublisher.clear(runId)
  }

  test("publish failure is logged and dropped, never fails the query (R10)") {
    val in = MemoryStream[(String, String)](spark)
    in.addData(("k1", "80"), ("k2", "90"))
    val runId = s"faulty_${System.nanoTime()}"
    val q = Pipelines.alerts(in.toDF().toDF("key", "value")).writeStream
      .foreach(new AlertForeachWriter("bme680warning", () => new AlertPublisher {
        private val delegate = new CollectingPublisher(runId)
        def connect(): Unit = ()
        def publish(msg: AlertMessage): Unit =
          if (msg.payload.contains("80")) throw new RuntimeException("broker down")
          else delegate.publish(msg)
        def close(): Unit = ()
      }))
      .option("checkpointLocation", tmpCkpt())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the failing record is dropped (QoS0), the good one delivered
    assert(CollectingPublisher.messages(runId).map(_.payload) ===
      Seq("Temperature warning 90.00"))
    CollectingPublisher.clear(runId)
  }

  private def ts(min: Int) = new Timestamp(min * 60000L)

  test("watermark drops late events from closed windows (s_watermark_late)") {
    val in = MemoryStream[(Timestamp, String)](spark)
    val name = s"wm_${System.nanoTime()}"
    val agg = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes"), $"k")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", tmpCkpt()).start()

    in.addData((ts(1), "a"), (ts(2), "a"), (ts(5), "b")) // window [0,10)
    q.processAllAvailable()
    // append mode: nothing final yet (watermark still at 0)
    assert(spark.table(name).count() === 0)

    in.addData((ts(60), "c")) // watermark → 50min; [0,10) finalizes
    q.processAllAvailable()
    val closed = spark.table(name)
      .select($"k", $"n").as[(String, Long)].collect().toMap
    assert(closed === Map("a" -> 2L, "b" -> 1L))

    in.addData((ts(3), "a")) // LATE: inside closed [0,10) — must be dropped
    q.processAllAvailable()
    assert(spark.table(name).count() === 2) // unchanged
    q.stop()
  }

  test("stream-stream LEFT OUTER interval join: matches emit eagerly, " +
      "unmatched views null-pad only after the watermark closes their " +
      "interval") {
    // The outer twin of q_stream_join: a view left-joins purchases by
    // the same user within [vts, vts + 10 min]. Structured Streaming
    // must buffer an unmatched view until the watermark proves no
    // purchase can still arrive, THEN emit it null-padded — the
    // late-emission semantics the inner join never exercises.
    val views = MemoryStream[(Timestamp, Long, Long)](spark)
    val buys = MemoryStream[(Timestamp, Long, Long)](spark)
    val name = s"soj_${System.nanoTime()}"
    val v = views.toDF().toDF("vts", "user_id", "view_id")
      .withWatermark("vts", "5 minutes")
    val b = buys.toDF().toDF("bts", "b_user", "purchase_id")
      .withWatermark("bts", "5 minutes")
    val joined = v.join(b,
      expr("""user_id = b_user AND
              bts >= vts AND bts <= vts + INTERVAL 10 MINUTES"""),
      "left_outer")
      .select($"view_id", $"purchase_id")
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", tmpCkpt()).start()

    // view 1 (user 7) gets a purchase in-window; view 2 (user 8) never
    // does — and user 8's eventual purchase lands OUTSIDE the interval
    views.addData((ts(1), 7L, 1L), (ts(2), 8L, 2L))
    buys.addData((ts(5), 7L, 100L))
    q.processAllAvailable()
    val matched = spark.table(name)
      .select($"view_id", $"purchase_id").as[(Long, java.lang.Long)]
      .collect().toSet
    assert(matched.contains((1L, 100L: java.lang.Long)))
    // the unmatched view must NOT have null-padded yet: its interval
    // [2, 12] + 5 min watermark delay is still open
    assert(!matched.exists { case (vid, pid) => vid == 2L && pid == null })

    // advance both watermarks far past view 2's interval
    views.addData((ts(60), 9L, 3L))
    buys.addData((ts(60), 8L, 101L))
    q.processAllAvailable()
    val after = spark.table(name)
      .select($"view_id", $"purchase_id").as[(Long, java.lang.Long)]
      .collect().toSet
    assert(after.exists { case (vid, pid) => vid == 2L && pid == null },
      s"unmatched view should null-pad after watermark: $after")
    q.stop()
  }

  test("streaming dropDuplicates with watermark keeps first occurrence") {
    val in = MemoryStream[(Timestamp, String)](spark)
    val name = s"dd_${System.nanoTime()}"
    val q = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("k")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", tmpCkpt()).start()
    in.addData((ts(1), "a"), (ts(2), "a"), (ts(3), "b"))
    q.processAllAvailable()
    in.addData((ts(4), "a"), (ts(5), "c"))
    q.processAllAvailable()
    val out = spark.table(name).select($"k").as[String].collect().sorted
    assert(out === Seq("a", "b", "c"))
    q.stop()
  }

  test("streaming near-dup filter drops exact and near duplicates, " +
      "keeps distinct docs") {
    val in = MemoryStream[(Timestamp, Long, String)](spark)
    val name = s"sdd_${System.nanoTime()}"
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val q = StreamingDedup.nearDupFilter(
        in.toDF().toDF("ts", "id", "text"), "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", tmpCkpt()).start()
    in.addData((ts(1), 1L, base), (ts(2), 2L, base)) // exact dup → dropped
    q.processAllAvailable()
    // a distinct doc passes; a later exact copy of doc 1 still dropped
    in.addData((ts(3), 3L, "completely different content here entirely"),
      (ts(4), 4L, base))
    q.processAllAvailable()
    val kept = spark.table(name).select($"id").as[Long].collect().sorted
    assert(kept === Seq(1L, 3L))
    q.stop()
  }

  test("near-dup filter at low perms agrees with batch signature equality") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val near = base.replace("dog", "cat")
    // ground truth from the batch side: do the two docs share the
    // 2-permutation signature key? (deterministic — fixed hashes)
    val collide = Seq(base, near).toDF("text")
      .select(StreamingDedup.signatureKey($"text", perms = 2).as("fp"))
      .distinct().count() == 1L
    val in = MemoryStream[(Timestamp, Long, String)](spark)
    val name = s"sdn_${System.nanoTime()}"
    val q = StreamingDedup.nearDupFilter(
        in.toDF().toDF("ts", "id", "text"), "text", "ts", "10 minutes",
        perms = 2)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", tmpCkpt()).start()
    in.addData((ts(1), 1L, base), (ts(2), 2L, near))
    q.processAllAvailable()
    val kept = spark.table(name).select($"id").as[Long].collect().sorted
    assert(kept === (if (collide) Seq(1L) else Seq(1L, 2L)))
    q.stop()
  }

  test("streaming exact-dup filter normalizes case/whitespace") {
    val in = MemoryStream[(Timestamp, Long, String)](spark)
    val name = s"sed_${System.nanoTime()}"
    val q = StreamingDedup.exactDupFilter(
        in.toDF().toDF("ts", "id", "text"), "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", tmpCkpt()).start()
    in.addData((ts(1), 1L, "Hello World"), (ts(2), 2L, "  hello world  "),
      (ts(3), 3L, "hello worlds"))
    q.processAllAvailable()
    val kept = spark.table(name).select($"id").as[Long].collect().sorted
    assert(kept === Seq(1L, 3L))
    q.stop()
  }

  test("dedup against a persisted index: historical duplicates AND a " +
      "batch-2 near-duplicate of a batch-1 arrival are flagged") {
    import scala.collection.mutable
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
    val nHist = vecs.count()
    val hist = graft.operators.AnnIndex.build(vecs, "vec_id", "embedding",
      tables = 16, persist = false)
    val filter = StreamingDedup.againstIndex(hist, "vec_id", "embedding",
      threshold = 0.95)
    // an exact copy of an INDEXED vector (historical duplicate)...
    val indexed0 = vecs.filter($"vec_id" === 0L)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    // ...and synthetic unit vectors: novel vs the random-ish corpus
    // (max |cos| well under the 0.95 gate), deterministic signatures
    def unit(dim: Int, eps: Double = 0.0): Seq[Double] =
      Seq.tabulate(64)(i =>
        if (i == dim) 1.0 else if (i == dim + 1) eps else 0.0)
    val novelIds = mutable.ArrayBuffer[Long]()
    val in = MemoryStream[(Timestamp, Long, Seq[Double])](spark)
    val q = in.toDF().toDF("ts", "vec_id", "embedding")
      .writeStream
      .foreachBatch(filter.foreachBatch { (novel, _) =>
        novelIds ++= novel.select("vec_id").collect().map(_.getLong(0))
      })
      .option("checkpointLocation", tmpCkpt())
      .start()
    // batch 1: 1001 duplicates the historical corpus → dropped;
    // 1002 is novel → kept and APPENDED to the index
    in.addData((ts(1), 1001L, indexed0), (ts(2), 1002L, unit(0)))
    q.processAllAvailable()
    // batch 2: 2001 near-duplicates batch-1's 1002 (not the historical
    // corpus!) → must be flagged via the appended index; 2002 is novel
    in.addData((ts(3), 2001L, unit(0, eps = 1e-6)),
      (ts(4), 2002L, unit(1)))
    q.processAllAvailable()
    q.stop()
    assert(novelIds.sorted === Seq(1002L, 2002L))
    // the index grew by exactly the two novel arrivals
    assert(filter.index.backing.select("vec_id").distinct().count() ===
      nHist + 2)
  }

  test("text dedup against a historical corpus: corpus copies, batch-" +
      "internal copies, and cross-batch copies all drop; novelty survives") {
    import scala.collection.mutable
    val hist = Seq("the quick brown fox jumps over the lazy dog",
      "an entirely different historical document body")
      .toDF("text")
    val filter = StreamingDedup.exactAgainstCorpus(hist, "text")
    val novelIds = mutable.ArrayBuffer[Long]()
    val in = MemoryStream[(Timestamp, Long, String)](spark)
    val q = in.toDF().toDF("ts", "id", "text")
      .writeStream
      .foreachBatch(filter.foreachBatch { (novel, _) =>
        novelIds ++= novel.select("id").collect().map(_.getLong(0))
      })
      .option("checkpointLocation", tmpCkpt())
      .start()
    // batch 1: 11 duplicates HISTORY (normalized — case/whitespace);
    // 12 is novel; 13 duplicates 12 INSIDE the batch → one survives;
    // 14 has NULL text → the sentinel fingerprint, novel once
    in.addData(
      (ts(1), 11L, "  The Quick Brown Fox Jumps Over The Lazy Dog  "),
      (ts(2), 12L, "a genuinely new document arriving in batch one"),
      (ts(3), 13L, "a genuinely new document arriving in batch one"),
      (ts(4), 14L, null))
    q.processAllAvailable()
    // batch 2: 21 duplicates batch-1's arrival (not history!) → drops
    // via the accumulated fingerprints; 22 is novel; 23's NULL text
    // dedups against 14's sentinel (NULL rows neither vanish nor
    // re-admit forever — the null-safe fingerprint)
    in.addData(
      (ts(5), 21L, "a genuinely new document arriving in batch one"),
      (ts(6), 22L, "and a second novelty arriving in batch two"),
      (ts(7), 23L, null))
    q.processAllAvailable()
    q.stop()
    assert(novelIds.length === 3, s"unexpected survivors: $novelIds")
    assert(novelIds.toSet.subsetOf(Set(12L, 13L, 14L, 22L)),
      s"unexpected survivors: $novelIds")
    assert(novelIds.contains(14L))
    assert(novelIds.contains(22L))
    // the fingerprint set grew by exactly the three novel fingerprints
    assert(filter.fingerprints.count() === 2L + 3L)
    filter.close() // release the pinned history + per-batch key frames
  }

  test("dedup against an IVF-PQ index: the probe-and-append trait lets " +
      "the compact-code family back the streaming filter") {
    import scala.collection.mutable
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
    val hist = graft.operators.IvfPqIndex.build(vecs, "vec_id", "embedding")
    val filter = StreamingDedup.againstIndex(hist, "vec_id", "embedding",
      threshold = 0.95)
    val indexed0 = vecs.filter($"vec_id" === 0L)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    def unit(dim: Int, eps: Double = 0.0): Seq[Double] =
      Seq.tabulate(64)(i =>
        if (i == dim) 1.0 else if (i == dim + 1) eps else 0.0)
    val novelIds = mutable.ArrayBuffer[Long]()
    val in = MemoryStream[(Timestamp, Long, Seq[Double])](spark)
    val q = in.toDF().toDF("ts", "vec_id", "embedding")
      .writeStream
      .foreachBatch(filter.foreachBatch { (novel, _) =>
        novelIds ++= novel.select("vec_id").collect().map(_.getLong(0))
      })
      .option("checkpointLocation", tmpCkpt())
      .start()
    // batch 1: a copy of an INDEXED vector drops (the IVF-PQ probe
    // rescores exactly, so the cos=1 match clears the threshold);
    // a novel unit vector survives and is appended (residual-encoded
    // under the EXISTING quantizers)
    in.addData((ts(1), 1001L, indexed0), (ts(2), 1002L, unit(0)))
    q.processAllAvailable()
    // batch 2: a near-copy of batch-1's NOVEL arrival must be caught
    // via the appended rows; an unrelated unit vector survives
    in.addData((ts(3), 2001L, unit(0, eps = 1e-6)),
      (ts(4), 2002L, unit(1)))
    q.processAllAvailable()
    q.stop()
    assert(novelIds.sorted === Seq(1002L, 2002L))
    filter.close(); hist.close()
  }

  test("index dedup filter drops near-duplicate pairs arriving in the " +
      "SAME micro-batch (keep-lowest-id)") {
    import scala.collection.mutable
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
    val hist = graft.operators.AnnIndex.build(vecs, "vec_id", "embedding",
      tables = 16, persist = false)
    val filter = StreamingDedup.againstIndex(hist, "vec_id", "embedding",
      threshold = 0.95)
    def unit(dim: Int, eps: Double = 0.0): Seq[Double] =
      Seq.tabulate(64)(i =>
        if (i == dim) 1.0 else if (i == dim + 1) eps else 0.0)
    val novelIds = mutable.ArrayBuffer[Long]()
    val in = MemoryStream[(Timestamp, Long, Seq[Double])](spark)
    val q = in.toDF().toDF("ts", "vec_id", "embedding")
      .writeStream
      .foreachBatch(filter.foreachBatch { (novel, _) =>
        novelIds ++= novel.select("vec_id").collect().map(_.getLong(0))
      })
      .option("checkpointLocation", tmpCkpt())
      .start()
    // ONE batch carrying a near-dup pair (the backlog-absorption shape
    // the r6 filter admitted wholesale) + an unrelated vector: only
    // the LOWEST id of the pair may survive
    in.addData((ts(1), 3001L, unit(2)), (ts(2), 3002L, unit(2, eps = 1e-6)),
      (ts(3), 3003L, unit(3)))
    q.processAllAvailable()
    q.stop()
    assert(novelIds.sorted === Seq(3001L, 3003L))
    // only the surviving rows were appended
    assert(filter.index.backing.select("vec_id").distinct().count() ===
      vecs.count() + 2)
    filter.close()
  }

  test("index auto-compaction bounds the append chain and leaves " +
      "novel-row output unchanged (vector twin of the fingerprint case)") {
    import scala.collection.mutable
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
    val hist = graft.operators.AnnIndex.build(vecs, "vec_id", "embedding",
      tables = 16, persist = false)
    val base = s"ixc_${System.nanoTime()}"
    val filter = StreamingDedup.againstIndex(hist, "vec_id", "embedding",
      threshold = 0.95).withAutoCompaction(base, everyN = 2)
    def unit(dim: Int, eps: Double = 0.0): Seq[Double] =
      Seq.tabulate(64)(i =>
        if (i == dim) 1.0 else if (i == dim + 1) eps else 0.0)
    val novelIds = mutable.ArrayBuffer[Long]()
    val in = MemoryStream[(Timestamp, Long, Seq[Double])](spark)
    val q = in.toDF().toDF("ts", "vec_id", "embedding")
      .writeStream
      .foreachBatch(filter.foreachBatch { (novel, _) =>
        novelIds ++= novel.select("vec_id").collect().map(_.getLong(0))
      })
      .option("checkpointLocation", tmpCkpt())
      .start()
    // 5 batches (> 2 compaction cycles): novel vectors interleaved
    // with near-copies of earlier batches, pre- and post-compaction —
    // output must be exactly the first occurrence of each direction
    in.addData((ts(1), 4001L, unit(2)), (ts(2), 4002L, unit(3)))
    q.processAllAvailable()
    in.addData((ts(3), 4003L, unit(2, eps = 1e-6)), // dup of batch 1
      (ts(4), 4004L, unit(4)))
    q.processAllAvailable() // next batch compacts (2 processed)
    in.addData((ts(5), 4005L, unit(3, eps = 1e-6)), // dup of a PRE-
      (ts(6), 4006L, unit(5)))                      // compaction arrival
    q.processAllAvailable()
    in.addData((ts(7), 4007L, unit(6)))
    q.processAllAvailable() // next batch compacts again (4 processed)
    in.addData((ts(8), 4008L, unit(5, eps = 1e-6)), // dup of a post-
      (ts(9), 4009L, unit(7)))                      // compaction arrival
    q.processAllAvailable()
    q.stop()
    assert(novelIds.sorted ===
      Seq(4001L, 4002L, 4004L, 4006L, 4007L, 4009L))
    // the chain is COLLAPSED: after ≥1 compaction the index backing
    // reads from the bucketed generation table, not a deep union chain
    // (post-compaction batches may each add one union arm)
    val plan = filter.index.backing.queryExecution.analyzed.toString
    val depth = "Union".r.findAllIn(plan).size
    assert(depth <= 2, s"union chain depth $depth — compaction did not " +
      s"collapse the chain:\n${plan.take(2000)}")
    // every arrival the filter admitted is probeable in the index
    assert(filter.index.backing.select("vec_id").distinct().count() ===
      vecs.count() + 6)
    filter.close()
    (1 to 3).foreach { g =>
      spark.sql(s"DROP TABLE IF EXISTS ${base}_g$g")
      spark.sql(s"DROP TABLE IF EXISTS ${base}_g${g}_meta")
    }
  }

  test("fingerprint auto-compaction bounds the union chain and leaves " +
      "novel-row output unchanged") {
    import scala.collection.mutable
    val hist = Seq("historical document one", "historical document two")
      .toDF("text")
    val base = s"fpc_${System.nanoTime()}"
    val filter = StreamingDedup.exactAgainstCorpus(hist, "text")
      .withAutoCompaction(base, everyN = 2)
    val novelIds = mutable.ArrayBuffer[Long]()
    val in = MemoryStream[(Timestamp, Long, String)](spark)
    val q = in.toDF().toDF("ts", "id", "text")
      .writeStream
      .foreachBatch(filter.foreachBatch { (novel, _) =>
        novelIds ++= novel.select("id").collect().map(_.getLong(0))
      })
      .option("checkpointLocation", tmpCkpt())
      .start()
    // 5 batches (> 2 compaction cycles): novel docs interleaved with
    // duplicates of history, earlier batches, and pre/post-compaction
    // arrivals — output must be exactly the first occurrence of each
    in.addData((ts(1), 1L, "novel doc alpha"),
      (ts(2), 2L, "historical document one"))
    q.processAllAvailable()
    in.addData((ts(3), 3L, "novel doc beta"), (ts(4), 4L, "novel doc alpha"))
    q.processAllAvailable() // next batch compacts (2 processed)
    in.addData((ts(5), 5L, "novel doc gamma"),
      (ts(6), 6L, "novel doc beta")) // dup of a PRE-compaction arrival
    q.processAllAvailable()
    in.addData((ts(7), 7L, "historical document two"))
    q.processAllAvailable() // next batch compacts again (4 processed)
    in.addData((ts(8), 8L, "novel doc delta"),
      (ts(9), 9L, "novel doc gamma")) // dup of a post-compaction arrival
    q.processAllAvailable()
    q.stop()
    assert(novelIds.sorted === Seq(1L, 3L, 5L, 8L))
    // the chain is COLLAPSED: after ≥1 compaction the fingerprint set
    // reads from the bucketed generation table, not a union chain
    val keysPlan = filter.fingerprints.queryExecution.analyzed.toString
    val depth = "Union".r.findAllIn(keysPlan).size
    assert(depth <= 2, s"union chain depth $depth — compaction did not " +
      s"collapse the chain:\n${keysPlan.take(2000)}")
    assert(filter.fingerprints.count() === 2L + 4L)
    filter.close()
    spark.sql(s"DROP TABLE IF EXISTS ${base}_g2")
    spark.sql(s"DROP TABLE IF EXISTS ${base}_g3")
  }

  test("streaming exact-dup state EVICTS once the watermark passes the " +
      "horizon (pins the dropDuplicatesWithinWatermark fix)") {
    // plain dropDuplicates on a key excluding the event-time column
    // never evicts state even with a watermark set (the r4 latent bug);
    // WithinWatermark drops closed-horizon keys. Output alone cannot
    // distinguish the two — only the state-store row count can, so
    // that is what this case asserts.
    val in = MemoryStream[(Timestamp, Long, String)](spark)
    val name = s"sev_${System.nanoTime()}"
    val q = StreamingDedup.exactDupFilter(
        in.toDF().toDF("ts", "id", "text"), "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", tmpCkpt()).start()
    // 20 distinct fingerprints land in state
    in.addData((1L to 20L).map(i => (ts(i.toInt), i, s"document body $i")): _*)
    q.processAllAvailable()
    val loaded = q.lastProgress.stateOperators.head.numRowsTotal
    assert(loaded >= 20L, s"state should hold the 20 keys, saw $loaded")
    // jump event time far past every key's horizon (20min + 10min
    // watermark), then one more batch so eviction runs under the
    // advanced watermark
    in.addData((ts(120), 100L, "far future doc one"))
    q.processAllAvailable()
    in.addData((ts(121), 101L, "far future doc two"))
    q.processAllAvailable()
    val after = q.lastProgress.stateOperators.head.numRowsTotal
    assert(after < 20L,
      s"closed-horizon state must evict (leaked dropDuplicates shape " +
        s"would hold all 22 keys); saw $after rows")
    // dedup still works for the live horizon
    in.addData((ts(122), 102L, "far future doc two"))
    q.processAllAvailable()
    assert(!spark.table(name).select($"id").as[Long].collect().contains(102L))
    q.stop()
  }

  test("near-dup filter across the watermark boundary: out-of-order dup " +
      "inside the horizon drops, a post-horizon copy re-admits") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val in = MemoryStream[(Timestamp, Long, String)](spark)
    val name = s"swb_${System.nanoTime()}"
    val q = StreamingDedup.nearDupFilter(
        in.toDF().toDF("ts", "id", "text"), "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", tmpCkpt()).start()
    in.addData((ts(20), 1L, base)) // first occurrence at t=20
    q.processAllAvailable()
    // OUT-OF-ORDER duplicate: event time t=12 < the first occurrence,
    // above the watermark (20-10=10) — must match state and drop
    in.addData((ts(12), 2L, base))
    q.processAllAvailable()
    // advance the watermark far past doc 1's horizon (20+10), with a
    // flushing batch so eviction completes
    in.addData((ts(120), 3L, "completely different content here entirely"))
    q.processAllAvailable()
    in.addData((ts(121), 4L, "another unrelated document body"))
    q.processAllAvailable()
    // the SAME text after the horizon re-admits — dedup state is
    // watermark-bounded BY DESIGN (the documented horizon semantics),
    // not a leak
    in.addData((ts(125), 5L, base))
    q.processAllAvailable()
    val kept = spark.table(name).select($"id").as[Long].collect().sorted
    assert(kept === Seq(1L, 3L, 4L, 5L))
    q.stop()
  }

  test("streaming session window merges within gap, splits beyond gap") {
    val in = MemoryStream[(Timestamp, String)](spark)
    val name = s"sess_${System.nanoTime()}"
    val q = in.toDF().toDF("ts", "user")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "30 minutes"), $"user")
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", tmpCkpt()).start()
    // u1: events at 0,20,40 min chain into ONE session (each gap < 30);
    // the event at 100 min starts a second session (gap 60 > 30).
    in.addData((ts(0), "u1"), (ts(20), "u1"), (ts(40), "u1"), (ts(100), "u1"))
    q.processAllAvailable()
    in.addData((ts(500), "u1")) // advance watermark far → both finalize
    q.processAllAvailable()
    val n = spark.table(name).select($"n").as[Long].collect().sorted
    assert(n === Seq(1L, 3L))
    q.stop()
  }

  test("session window boundary: exact-gap events MERGE, gap+1min splits") {
    // SURVEY.md §7.5.3 adversarial boundary — per-event windows
    // [ts, ts+gap) merge when they TOUCH: an event landing exactly `gap`
    // after the previous one continues the session (verified batch ==
    // streaming on 4.1.2); the oracle for q_window_session therefore
    // splits only on diff > gap, strictly.
    val in = MemoryStream[(Timestamp, String)](spark)
    val name = s"sessb_${System.nanoTime()}"
    val q = in.toDF().toDF("ts", "user")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "30 minutes"), $"user")
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", tmpCkpt()).start()
    // 0 → 30 min: exactly the gap → merges; 30 → 61 min: 31 > gap →
    // a new session of one.
    in.addData((ts(0), "u1"), (ts(30), "u1"), (ts(61), "u1"))
    q.processAllAvailable()
    in.addData((ts(500), "u1"))
    q.processAllAvailable()
    val n = spark.table(name).select($"n").as[Long].collect().sorted
    assert(n === Seq(1L, 2L))
    q.stop()
  }

  test("stream-stream interval join matches only within the time bound") {
    def run(cond: String, base: Int): Seq[Long] = {
      val views = MemoryStream[(Timestamp, Long)](spark)
      val buys = MemoryStream[(Timestamp, Long)](spark)
      val name = s"ssj_${System.nanoTime()}"
      val v = views.toDF().toDF("vts", "v_user").withWatermark("vts", "1 hour")
      val b = buys.toDF().toDF("bts", "b_user").withWatermark("bts", "1 hour")
      val q = v.join(b, expr(cond))
        .select($"v_user")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").option("checkpointLocation", tmpCkpt()).start()
      views.addData((ts(base + 0), 1L), (ts(base + 0), 2L))
      buys.addData((ts(base + 10), 1L), (ts(base + 50), 2L))
      q.processAllAvailable()
      val out = spark.table(name).as[Long].collect().toSeq.sorted
      q.stop()
      out
    }
    val cond =
      "v_user = b_user AND bts >= vts AND bts <= vts + interval 30 minutes"
    // Event times must sit well past the epoch: a watermark of
    // maxEventTime - delay that lands BEFORE 1970 underflows the join's
    // state-watermark arithmetic and the interval join emits nothing
    // (verified on 4.1.2; epoch-0 fixtures silently produce zero rows).
    val out = run(cond, 26 * 1000000) // ≈ 2019-06
    // user 1 purchases 10 min after the view → inside the 30-minute
    // bound; user 2 at +50 min → outside, must not join
    assert(out === Seq(1L))
  }

  test("flatMapGroupsWithState carries running state across micro-batches") {
    val in = MemoryStream[UserEvent](spark)
    val name = s"st_${System.nanoTime()}"
    val q = StatefulOps.runningStatsStream(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", tmpCkpt()).start()
    in.addData(
      UserEvent(1L, 10L, ts(1), 50.0),
      UserEvent(1L, 11L, ts(2), 80.0),
      UserEvent(2L, 20L, ts(1), 70.0))
    q.processAllAvailable()
    in.addData(UserEvent(1L, 12L, ts(3), 60.0)) // state must resume at seq=2
    q.processAllAvailable()
    val out = spark.table(name).as[RunOut].collect()
      .map(r => (r.user_id, r.event_id) -> (r.seq, r.run_max)).toMap
    assert(out((1L, 10L)) === (1L, 50.0))
    assert(out((1L, 11L)) === (2L, 80.0))
    assert(out((2L, 20L)) === (1L, 70.0))
    // batch 2: seq continues, running max remembers the 80.0 from batch 1
    assert(out((1L, 12L)) === (3L, 80.0))
    // streaming rows match the batch flatMapGroups twin on the same data
    import spark.implicits._
    val batch = StatefulOps.runningStats(Seq(
      UserEvent(1L, 10L, ts(1), 50.0), UserEvent(1L, 11L, ts(2), 80.0),
      UserEvent(2L, 20L, ts(1), 70.0), UserEvent(1L, 12L, ts(3), 60.0)
    ).toDS()).collect()
      .map(r => (r.user_id, r.event_id) -> (r.seq, r.run_max)).toMap
    assert(batch === out)
    q.stop()
  }

  test("runningStats streams a hot key: skewed fixture equals window plan") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // one user owns ~100k of 101k events — the straggler/OOM shape the
    // old buffer-the-group form would concentrate in a single task
    val n = 101000
    val ev = spark.range(n).select(
        when(col("id") % 101 === 0, 2L).otherwise(1L).as("user_id"),
        col("id").as("event_id"),
        col("id").cast("timestamp").as("ts"),
        (col("id") % 97).cast("double").as("value"))
      .as[graft.streaming.UserEvent]
    val got = StatefulOps.runningStats(ev).toDF()
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = ev.toDF()
      .select(col("user_id"), col("event_id"),
        row_number().over(w).cast("long").as("seq"),
        max("value").over(w).as("run_max"))
    assert(got.count() === n.toLong)
    assert(got.exceptAll(want).count() === 0L)
    assert(want.exceptAll(got).count() === 0L)
  }

  test("graceful shutdown drains active queries cleanly (R12)") {
    val in = MemoryStream[(String, String)](spark)
    in.addData(("k1", "80"), ("k2", "90"))
    val runId = s"shutdown_${System.nanoTime()}"
    val (pass, alerts) = AlertStreamJob.start(
      in.toDF().toDF("key", "value"), "bme680warning",
      () => new CollectingPublisher(runId), tmpCkpt())
    // the hook body: stop every active query — must drain without
    // surfacing an exception on either branch, whatever state each
    // micro-batch is in, and must be safe to call twice
    AlertStreamJob.stopAll(spark)
    AlertStreamJob.stopAll(spark)
    assert(spark.streams.active.isEmpty)
    assert(pass.exception.isEmpty && alerts.exception.isEmpty)
    CollectingPublisher.clear(runId)
  }

  test("Kafka integration fails fast with guidance when connector absent (R1)") {
    import graft.streaming.{AlertStreamJob, CollectingPublisher, KafkaIntegration}
    if (KafkaIntegration.available)
      cancel("spark-sql-kafka present — integration covered by deployment")
    // every Kafka entry point must name the remedy, not die in source
    // lookup: the source, the sink, and the full topology
    val src = intercept[IllegalStateException] {
      AlertStreamJob.kafkaSource(spark, "localhost:9092")
    }
    assert(src.getMessage.contains("spark-sql-kafka"))
    val topo = intercept[IllegalStateException] {
      AlertStreamJob.startKafka(spark, "localhost:9092", "bme680",
        "bme680out", "alert", () => new CollectingPublisher("kafka-gate"),
        "/tmp/graft-kafka-ck")
    }
    assert(topo.getMessage.contains("spark-sql-kafka"))
  }

  test("Kafka sink frame projects the exact (key, value) string contract (R2)") {
    import graft.streaming.KafkaIntegration
    // pure wiring, assertable offline: whatever the pass-through carries
    // is cast into Kafka's sink schema — exactly two string columns
    import spark.implicits._
    val frame = Seq((42L, """{"bme680_tempf":"80.0"}"""))
      .toDF("event_id", "props")
      .selectExpr("CAST(event_id AS STRING) AS key", "props AS value")
    val kf = KafkaIntegration.toKafkaFrame(
      graft.streaming.Pipelines.passthrough(frame))
    assert(kf.schema.fieldNames.toSeq === Seq("key", "value"))
    assert(kf.schema.fields.forall(_.dataType.typeName === "string"))
    assert(kf.head().getString(0) === "42")
  }

  test("MQTT publisher is absent offline and fails fast with guidance (R10)") {
    assume(!MqttPublisher.available, "paho unexpectedly on classpath")
    val p = new MqttPublisher("tcp://localhost:1883", "graft-test")
    val e = intercept[IllegalStateException](p.connect())
    assert(e.getMessage.contains("paho"))
    p.close() // never-connected close is a no-op
  }

  test("startup diagnostics banner is once-per-session and idempotent (R14)") {
    // both calls must be safe; the second is a no-op (guarded set)
    graft.tools.Diagnostics.startupBanner(spark)
    graft.tools.Diagnostics.startupBanner(spark)
  }

  test("q_approx_distinct: HLL estimate within 5% of exact per group") {
    val approx = SparkEntry.queries("q_approx_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.sources.Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(countDistinct("o_orderkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n) <= math.max(1L, (n * 0.05).toLong),
        s"group $k: approx $a vs exact $n")
    }
  }

  test("q_hll_merge: daily-sketch union within 5% of exact distinct " +
    "users per type, and merging loses nothing vs one-shot sketching") {
    val merged = SparkEntry.queries("q_hll_merge")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = graft.sources.Tables.events(spark, sfDir)
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(merged(k) - n) <= math.max(1L, (n * 0.05).toLong),
        s"type $k: merged ${merged(k)} vs exact $n")
    }
    // the merge path must equal sketching the un-partitioned corpus
    // directly — mergeability is the operator's whole claim
    val oneShot = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === oneShot)
  }

  test("q_approx_quantile: sketch percentiles within 1% rank error of exact") {
    val approx = SparkEntry.queries("q_approx_quantile")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = graft.sources.Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.95, 0.99))")
        .as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(approx.keySet === exact.keySet)
    for {
      (flag, qs) <- approx
      ((a, e), p) <- qs.zip(exact(flag)).zip(Seq(0.5, 0.95, 0.99))
    } {
      // with accuracy 10000 the rank error is ≤ 1/10000; allow 1% of
      // the exact VALUE as a generous cross-distribution bound
      assert(math.abs(a - e) <= math.abs(e) * 0.01,
        s"group $flag p$p: approx $a vs exact $e")
    }
  }

  test("q_alert_stream (incremental run) matches batch alertPipeline") {
    val streamed = graft.operators.ReferenceOps.alertStream(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.ReferenceOps.alertPipeline(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch && streamed.nonEmpty)
  }

  test("stream-STATIC broadcast join: streaming events scored against " +
    "batch anomaly stats match the batch result exactly") {
    // the enrichment pattern at scale: a static (batch-computed,
    // broadcastable) reference table joined into every micro-batch of
    // an unbounded stream — stateless, no watermark, no state store
    import graft.operators.EventOps
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("event_id", "event_type", "value")
    val stats = EventOps.anomalyStats(ev, "event_type", "value")
      .localCheckpoint() // freeze: the static side of the join
    val in = MemoryStream[(Long, String, Double)](spark)
    val got = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    val q = EventOps.anomalyScore(
        in.toDF().toDF("event_id", "event_type", "value"),
        stats, "event_type", "event_id", "value")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.collect().map(r => (r.getLong(0), r.getDouble(3)))
        ()
      }
      .option("checkpointLocation", tmpCkpt())
      .start()
    val rows = ev.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // feed the same corpus through in two micro-batches
    val (b1, b2) = rows.splitAt(rows.length / 2)
    in.addData(b1.toIndexedSeq); q.processAllAvailable()
    in.addData(b2.toIndexedSeq); q.processAllAvailable()
    q.stop()
    val want = EventOps.anomaly(ev, "event_type", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(got.sortBy(_._1).toSeq === want.sortBy(_._1).toSeq)
    assert(got.nonEmpty)
  }

  test("streaming drift monitor: per-micro-batch PSI against a static " +
    "baseline equals the batch drift on the same split") {
    // drift monitoring as an operational loop: the baseline population
    // (period 0) is a static frame; each micro-batch unions in as
    // period 1 and the SAME oracle-gated drift operator scores it —
    // batch is the semantic spec, foreachBatch just re-runs it
    import graft.operators.EventOps
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"),
        (col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"))
          .cast("int").as("is_base"))
    val baseline = ev.filter(col("is_base") === 1)
      .select(col("event_type"), col("value"), lit(0).as("period"))
      .localCheckpoint()
    val currentRows = ev.filter(col("is_base") === 0)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val in = MemoryStream[(String, Double)](spark)
    var last: Seq[(String, Double)] = Nil
    val q = in.toDF().toDF("event_type", "value")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val cur = b.select(col("event_type"), col("value"),
          lit(1).as("period"))
        last = EventOps.drift(baseline.unionByName(cur), "event_type",
            "value", "period", 50.0)
          .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
        ()
      }
      .option("checkpointLocation", tmpCkpt())
      .start()
    in.addData(currentRows.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    // one micro-batch carrying the whole current population ≡ q_drift
    val want = SparkEntry.queries("q_drift")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(last === want && last.nonEmpty)
  }
}
