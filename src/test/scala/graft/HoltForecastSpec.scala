package graft

import graft.streaming.{HoltForecast, HoltOut, StateStores, UserEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files
import java.sql.Timestamp

/** Laws for the Holt level+trend forecaster: brute-force recursion
  * equality, convergence to the true line on exact linear input, and
  * cross-batch transformWithState ≡ batch under RocksDB. */
class HoltForecastSpec extends SparkSpec {

  private def ts(min: Int) = new Timestamp(min * 60000L)
  private def tmpCkpt(): String =
    Files.createTempDirectory("graft_ckpt_").toString

  test("holtBatch equals the brute-force recursion and converges to " +
    "the true line: trend -> slope, forecast -> next value") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vals = (0 until 150).map(i => 20.0 + 1.5 * i +
      (rnd.nextDouble() - 0.5) * 2.0)
    val ev = vals.zipWithIndex.map { case (v, i) =>
      UserEvent(1L, i.toLong, ts(i), v) }
    val (alpha, beta, h) = (0.3, 0.1, 1)
    val out = HoltForecast.holtBatch(ev.toDS(), alpha, beta, h)
      .collect().sortBy(_.event_id)
    // brute force
    var (l, b) = (vals.head, 0.0)
    val brute = vals.head +: vals.tail.map { x =>
      val l1 = alpha * x + (1 - alpha) * (l + b)
      b = beta * (l1 - l) + (1 - beta) * b
      l = l1
      l
    }
    out.zip(brute).foreach { case (o, exp) =>
      assert(math.abs(o.level - exp) < 1e-9, s"event ${o.event_id}")
      assert(math.abs(o.forecast - (o.level + h * o.trend)) < 1e-12)
    }
    // after burn-in on a near-line, the trend estimate sits at the
    // slope and the 1-step forecast lands within the noise band
    val tail = out.takeRight(30)
    assert(tail.forall(o => math.abs(o.trend - 1.5) < 0.5),
      s"trend drifted: ${tail.map(_.trend).min}..${tail.map(_.trend).max}")
    val exact = (0 until 100).map(i =>
      UserEvent(2L, (1000 + i).toLong, ts(i), 5.0 + 2.0 * i))
    val last = HoltForecast.holtBatch(exact.toDS(), 0.5, 0.3, 1)
      .collect().maxBy(_.event_id)
    // exact line: forecast for step 100 is 5 + 2*100 = 205
    assert(math.abs(last.forecast - 205.0) < 0.5,
      s"linear forecast off: ${last.forecast}")
  }

  test("transformWithState Holt (RocksDB): cross-batch fold equal to " +
    "the batch form; per-key recursions are independent") {
    val ev = (0 until 40).map(i =>
      UserEvent(1L + i % 2, i.toLong, ts(i), 10.0 + (i / 2) * 3.0))
    val s = StateStores.rocksDBSession(spark)
    import s.implicits._
    val in = MemoryStream[UserEvent](s)
    val name = s"ss_holt_${System.nanoTime()}"
    val q = HoltForecast.holtTws(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", tmpCkpt())
      .start()
    in.addData(ev.take(15): _*)
    q.processAllAvailable()
    in.addData(ev.drop(15): _*)
    q.processAllAvailable()
    val out = s.table(name).as[HoltOut].collect()
      .sortBy(o => (o.user_id, o.event_id)).toSeq
    q.stop()
    val expected = {
      import spark.implicits._
      HoltForecast.holtBatch(ev.toDS())
        .collect().sortBy(o => (o.user_id, o.event_id)).toSeq
    }
    assert(out === expected,
      "transformWithState Holt diverges from the batch form")
  }

  test("degenerate smoothing parameters are rejected") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      HoltForecast.holtBatch(Seq.empty[UserEvent].toDS(), alpha = 1.0)
    }
    intercept[IllegalArgumentException] {
      HoltForecast.holtBatch(Seq.empty[UserEvent].toDS(), h = 0)
    }
  }
}
