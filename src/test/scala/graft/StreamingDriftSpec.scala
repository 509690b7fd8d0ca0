package graft

import graft.streaming.StreamingDrift
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming PSI drift monitor: windows matching the reference stay
  * quiet, a shifted window alerts, emission is append-mode (once per
  * closed window), and the plan carries exactly ONE stateful
  * aggregation. */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  private val reference = {
    // uniform 0..99 reference corpus
    val ref = (0 until 1000).map(i => (i % 100).toDouble).toDF("v")
    StreamingDrift.referenceProfile(ref, "v")
  }

  test("a window drawn from the reference distribution stays under " +
    "the alert line; a hard-shifted window alerts — each window " +
    "emitted exactly once (append mode)") {
    val in = MemoryStream[(Timestamp, Double)](spark)
    val df = in.toDF().toDF("t", "v")
    val name = s"drift_${System.nanoTime()}"
    val q = StreamingDrift.psiStream(df, "t", "v", reference,
        windowDur = "10 minutes", watermark = "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_drift_").toString)
      .start()
    try {
      // window [10:00, 10:10): matches the reference (uniform 0..99)
      in.addData((0 until 500).map(i => (ts(i % 10), (i % 100).toDouble)): _*)
      q.processAllAvailable()
      // window [10:10, 10:20): everything in the top decile
      in.addData((0 until 500).map(i => (ts(10 + i % 10), 95.0 + i % 5)): _*)
      q.processAllAvailable()
      // advance the watermark past both windows so they close
      in.addData((ts(35), 50.0))
      q.processAllAvailable()
      val rows = spark.table(name)
        .select("window_start", "n", "psi", "alert")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1),
          r.getDouble(2), r.getBoolean(3)))
        .sortBy(_._1.getTime)
      assert(rows.length === 2, rows.mkString("; "))
      val (_, n0, psi0, alert0) = rows(0)
      val (_, n1, psi1, alert1) = rows(1)
      assert(n0 === 500L && n1 === 500L)
      assert(psi0 < 0.05 && !alert0, s"matching window must stay quiet: $psi0")
      assert(psi1 > 0.25 && alert1, s"shifted window must alert: $psi1")
    } finally q.stop()
  }

  test("the plan carries exactly one stateful aggregation (the " +
    "conditional-sum bin profile folds inside it)") {
    val in = MemoryStream[(Timestamp, Double)](spark)
    val df = StreamingDrift.psiStream(in.toDF().toDF("t", "v"), "t", "v",
      reference)
    val name = s"driftplan_${System.nanoTime()}"
    val q = df.writeStream.outputMode("append").format("memory")
      .queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_driftp_").toString)
      .start()
    try {
      in.addData((ts(0), 1.0)); q.processAllAvailable()
      val p = q.lastProgress
      assert(p.stateOperators.length === 1,
        s"expected 1 stateful operator, got ${p.stateOperators.length}")
    } finally q.stop()
  }

  test("referenceProfile proportions sum to 1 and reflect the corpus") {
    val (props, lo, hi) = reference
    assert(props.size === 10)
    assert(math.abs(props.sum - 1.0) < 1e-9)
    assert(lo === 0.0 && hi === 99.0)
    // uniform corpus → every decile ~0.1
    props.foreach(p => assert(math.abs(p - 0.1) < 0.02))
  }
}
