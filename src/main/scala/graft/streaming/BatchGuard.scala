package graft.streaming

import org.apache.spark.sql.DataFrame

/** Stopped-context guard for the stateful foreachBatch sinks (r17
  * verdict item 1): when an EXTERNAL shutdown (JVM shutdown hook, test
  * harness timeout) stops the SparkContext while a micro-batch is
  * mid-flight, the sink's eager actions (persist/count/writeBucketed)
  * otherwise die deep inside the block manager with an opaque stack
  * that reads as a SINK bug. Checking at batch entry turns that into a
  * loud, attributable abort BEFORE any state (pinned frames, table
  * generations, index appends) is half-mutated — the sink's state is
  * exactly what it was after the last completed batch. */
private[streaming] object BatchGuard {
  def check(batch: DataFrame, who: String): Unit = {
    val sc = batch.sparkSession.sparkContext
    if (sc.isStopped)
      throw new IllegalStateException(
        s"$who.processBatch: SparkContext already stopped (external " +
          "shutdown in progress) — aborting the micro-batch before any " +
          "state mutation; sink state is unchanged since the last " +
          "completed batch")
  }
}
