package graft

import graft.streaming.{CusumOut, StateStores, StreamingCusum, UserEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files
import java.sql.Timestamp

/** Laws for the CUSUM mean-shift detector: detection behavior on an
  * in-control vs level-shifted stream (batch form), restart semantics,
  * and cross-batch `transformWithState` ≡ batch equivalence under the
  * RocksDB provider (the StateStoreSpec stance). */
class StreamingCusumSpec extends SparkSpec {

  private def ts(min: Int) = new Timestamp(min * 60000L)
  private def tmpCkpt(): String =
    Files.createTempDirectory("graft_ckpt_").toString

  // deterministic in-control noise in [-1, 1] around mu = 10
  private def noise(i: Int): Double = ((i * 7919) % 201 - 100) / 100.0

  test("cusumBatch: silent on an in-control stream, pages within a " +
    "few events of a 2-sigma level shift, and re-arms after the alert") {
    import spark.implicits._
    val mu = 10.0; val sigma = 1.0
    // 200 in-control events, then a persistent +2σ shift
    val ev = (0 until 200).map(i =>
      UserEvent(1L, i.toLong, ts(i), mu + noise(i))) ++
      (200 until 240).map(i =>
        UserEvent(1L, i.toLong, ts(i), mu + 2.0 + noise(i)))
    val out = StreamingCusum.cusumBatch(ev.toDS(), mu, sigma)
      .collect().sortBy(_.event_id)
    val alerts = out.filter(_.alert).map(_.event_id)
    assert(alerts.forall(_ >= 200L),
      s"false alarm before the shift: ${alerts.take(3).toSeq}")
    assert(alerts.nonEmpty && alerts.head <= 212L,
      s"shift at 200 detected too late: ${alerts.headOption}")
    // restart semantics: state resets after the alert, so the ongoing
    // shift pages AGAIN (repeated shifts are not swallowed)
    assert(alerts.length >= 2, "alert must re-arm while the shift persists")
    // the row after an alert restarts its accumulation from zero
    val firstAlertIdx = out.indexWhere(_.alert)
    val next = out(firstAlertIdx + 1)
    assert(next.cusum_pos <= math.max(0.0,
      next.value - mu - 0.5 * sigma) + 1e-9)
  }

  test("cusumBatch: a downward shift trips the negative side, and " +
    "per-key state is independent") {
    import spark.implicits._
    val mu = 10.0; val sigma = 1.0
    val shifted = (0 until 60).map(i =>
      UserEvent(1L, i.toLong, ts(i), mu - 3.0 + noise(i)))
    val steady = (0 until 60).map(i =>
      UserEvent(2L, (100 + i).toLong, ts(i), mu + noise(i)))
    val out = StreamingCusum
      .cusumBatch((shifted ++ steady).toDS(), mu, sigma)
      .collect()
    val k1 = out.filter(_.user_id == 1L)
    val k2 = out.filter(_.user_id == 2L)
    assert(k1.exists(o => o.alert && o.cusum_neg > o.cusum_pos),
      "downward shift must trip the negative accumulator")
    assert(k2.forall(!_.alert), "steady key must stay silent")
  }

  test("transformWithState CUSUM (RocksDB): cross-batch ValueState " +
    "fold equal to the batch form") {
    val mu = 10.0; val sigma = 1.0
    val ev = (0 until 30).map(i =>
      UserEvent(1L + i % 2, i.toLong, ts(i),
        if (i >= 20) mu + 4.0 else mu + noise(i)))
    val s = StateStores.rocksDBSession(spark)
    import s.implicits._
    val in = MemoryStream[UserEvent](s)
    val name = s"ss_cusum_${System.nanoTime()}"
    val q = StreamingCusum.cusumTws(in.toDS(), mu, sigma)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", tmpCkpt())
      .start()
    in.addData(ev.take(10): _*)
    q.processAllAvailable()
    in.addData(ev.slice(10, 20): _*) // state reloads across batches
    q.processAllAvailable()
    in.addData(ev.drop(20): _*)
    q.processAllAvailable()
    val out = s.table(name).as[CusumOut].collect()
      .sortBy(o => (o.user_id, o.event_id)).toSeq
    q.stop()
    val expected = {
      import spark.implicits._
      StreamingCusum.cusumBatch(ev.toDS(), mu, sigma)
        .collect().sortBy(o => (o.user_id, o.event_id)).toSeq
    }
    assert(out === expected,
      "transformWithState CUSUM diverges from the batch form")
  }

  test("reference computes DECIMAL-exact moments and degenerate " +
    "parameters are rejected") {
    import spark.implicits._
    val ref = Seq(8.0, 10.0, 12.0).toDF("v")
    val (mu, sd) = StreamingCusum.reference(ref, "v")
    assert(mu === 10.0)
    assert(math.abs(sd - 2.0) < 1e-12)
    intercept[IllegalArgumentException] {
      StreamingCusum.cusumBatch(Seq.empty[UserEvent].toDS(), 0.0, 0.0)
    }
  }
}
