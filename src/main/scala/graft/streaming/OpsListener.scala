package graft.streaming

import org.apache.spark.internal.Logging
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Ops-metrics parity with the reference's 120-second heap/timestamp
  * printer (BME680.java:80-87,220-221): Structured Streaming pushes a
  * progress event per micro-batch, to which we append the same JVM
  * used-heap reading. Rates, row counts and state-store metrics come free
  * in `progress.json`.
  */
final class OpsListener extends StreamingQueryListener with Logging {

  private def usedHeap: Long = {
    val rt = Runtime.getRuntime
    rt.totalMemory() - rt.freeMemory()
  }

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit =
    logInfo(s"query started: ${e.name} run=${e.runId} heapUsed=$usedHeap")

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit =
    logInfo(s"progress: batch=${e.progress.batchId} " +
      s"rows=${e.progress.numInputRows} heapUsed=$usedHeap")

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    logInfo(s"query terminated: run=${e.runId} " +
      s"error=${e.exception.getOrElse("none")} heapUsed=$usedHeap")
}
