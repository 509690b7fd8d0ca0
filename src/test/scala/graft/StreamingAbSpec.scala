package graft

import graft.streaming.StreamingAb
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Laws for the streaming A/B guardrail: per-trigger readout equals
  * the batch closed form on every stream prefix, the alert flag fires
  * only on a genuinely broken variant, and degenerate inputs (one
  * arm, all/none converted) yield NULL z and a quiet alert flag. */
class StreamingAbSpec extends SparkSpec {
  import spark.implicits._

  private def tmpCkpt(): String =
    Files.createTempDirectory("graft_ckpt_").toString

  private case class Prefix(na: Long, ca: Long, nb: Long, cb: Long)

  private def closedZ(p: Prefix): Option[Double] = {
    if (p.na == 0 || p.nb == 0) return None
    val pool = (p.ca + p.cb).toDouble / (p.na + p.nb)
    if (pool <= 0.0 || pool >= 1.0) return None
    Some((p.ca.toDouble / p.na - p.cb.toDouble / p.nb) /
      math.sqrt(pool * (1 - pool) * (1.0 / p.na + 1.0 / p.nb)))
  }

  test("monitor: per-trigger row equals the batch closed form on " +
    "every prefix, and a broken variant trips the alert") {
    val in = MemoryStream[(String, Int)](spark)
    val name = s"ab_mon_${System.nanoTime()}"
    val q = StreamingAb.monitor(in.toDF().toDF("variant", "converted"),
        "variant", "converted", "A", "B")
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").option("checkpointLocation", tmpCkpt())
      .start()
    // batch 1: healthy — similar rates
    val b1 = (1 to 50).map(i => ("A", i % 5 / 4)) ++
      (1 to 50).map(i => ("B", i % 4 / 3)) ++
      Seq(("C", 1)) // stray arm must be ignored
    in.addData(b1: _*)
    q.processAllAvailable()
    def readRow() = spark.table(name).collect()(0)
    var r = readRow()
    val p1 = Prefix(50, b1.filter(_._1 == "A").map(_._2).sum,
      50, b1.filter(_._1 == "B").map(_._2).sum)
    assert(r.getAs[Long]("n_a") === p1.na)
    assert(r.getAs[Long]("conv_a") === p1.ca)
    assert(math.abs(r.getAs[Double]("z") - closedZ(p1).get) < 1e-9)
    assert(!r.getAs[Boolean]("alert"))
    // batch 2: variant B breaks (conversions stop dead)
    val b2 = (1 to 200).map(i => ("A", i % 5 / 4)) ++
      (1 to 200).map(_ => ("B", 0))
    in.addData(b2: _*)
    q.processAllAvailable()
    r = readRow()
    val p2 = Prefix(250, p1.ca + b2.filter(_._1 == "A").map(_._2).sum,
      250, p1.cb)
    assert(r.getAs[Long]("n_b") === p2.nb)
    assert(math.abs(r.getAs[Double]("z") - closedZ(p2).get) < 1e-9)
    assert(r.getAs[Boolean]("alert"),
      s"broken variant must alert; z = ${r.getAs[Double]("z")}")
    q.stop()
  }

  test("monitor: single-arm and saturated pools give NULL z and a " +
    "quiet alert flag") {
    val oneArm = Seq(("A", 1), ("A", 0), ("A", 1)).toDF("variant",
      "converted")
    val r1 = StreamingAb.monitor(oneArm, "variant", "converted",
      "A", "B").collect()(0)
    assert(r1.isNullAt(r1.fieldIndex("z")))
    assert(!r1.getAs[Boolean]("alert"))
    assert(r1.getAs[Long]("n_b") === 0L)
    // everyone converted: pooled p = 1, z undefined, no alert
    val sat = Seq(("A", 1), ("B", 1), ("A", 1)).toDF("variant",
      "converted")
    val r2 = StreamingAb.monitor(sat, "variant", "converted",
      "A", "B").collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("z")))
    assert(!r2.getAs[Boolean]("alert"))
  }
}
