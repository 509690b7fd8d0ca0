package graft.tools

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.{StateStores, StreamingDedup}

/** Measurement harness for the state-store provider trade (BASELINE.md
  * §state-stores): pushes an N-key streaming exact-dedup workload — the
  * engine's heaviest state accumulator, one fingerprint row per distinct
  * doc retained for the watermark horizon — through BOTH providers and
  * reports state rows, provider-reported state memory, and per-batch
  * commit wall time. Run: `sbt "runMain graft.tools.StateStoreProbe [nKeys]"`.
  */
object StateStoreProbe {

  private def runOnce(s: SparkSession, label: String, nKeys: Int,
      batches: Int): (String, Long, Long, Double) = {
    import s.implicits._
    val in = MemoryStream[(Timestamp, Long, String)](s)
    val name = s"probe_${label}_${System.nanoTime()}"
    val q: StreamingQuery = StreamingDedup.exactDupFilter(
        in.toDF().toDF("ts", "id", "text"), "text", "ts", "120 minutes")
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory(s"probe_ckpt_$label").toString)
      .start()
    val perBatch = nKeys / batches
    val t0 = System.nanoTime()
    for (b <- 0 until batches) {
      // distinct docs only: every row becomes a state entry
      val rows = (0 until perBatch).map { i =>
        val id = b.toLong * perBatch + i
        (new Timestamp(60000L * b), id, s"document body number $id with unique content")
      }
      in.addData(rows)
      q.processAllAvailable()
    }
    val wallSec = (System.nanoTime() - t0) / 1e9
    val last = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty).get.stateOperators.head
    val out = (label, last.numRowsTotal, last.memoryUsedBytes, wallSec)
    q.stop()
    out
  }

  def main(args: Array[String]): Unit = {
    val nKeys = args.headOption.map(_.toInt).getOrElse(200000)
    val batches = 8
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = Seq(
      "hdfs" -> StateStores.sessionWithProvider(spark, StateStores.DefaultProvider),
      "rocksdb" -> StateStores.rocksDBSession(spark)
    ).map { case (label, s) => runOnce(s, label, nKeys, batches) }
    results.foreach { case (label, rows, bytes, sec) =>
      println(f"""{"provider":"$label","state_rows":$rows,"state_bytes":$bytes,"wall_sec":$sec%.2f,"keys":$nKeys,"batches":$batches}""")
    }
    spark.stop()
  }
}
