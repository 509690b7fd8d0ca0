package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.slf4j.LoggerFactory

/** Execution-time surfacing of `Dataset.observe` metrics.
  *
  * Operators that drop data under a scale guard (e.g. the LSH band-bucket
  * cap in [[graft.operators.DedupOps]]) attach an observed metric to the
  * plan instead of running a separate counting job; this listener logs
  * those metrics when the query that carries them actually executes — no
  * extra Spark job, no silent truncation.
  *
  * Sessions are held in a weak set so a stopped session never pins the
  * listener registry (the leak shape flagged by the r02 ADVICE for the
  * index caches).
  */
object ObservedMetrics {

  private val log = LoggerFactory.getLogger(getClass)
  private val counter = new AtomicLong()
  private val sessions = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Unique-within-JVM observation name — `observe` requires names to be
    * unique within one query plan, and a library operator can appear
    * several times in a caller's composed query. */
  def nextName(prefix: String): String =
    s"${prefix}_${counter.incrementAndGet()}"

  /** Idempotently attach the metric-logging listener to a session. */
  def register(spark: SparkSession): Unit =
    if (sessions.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_")) {
              val dropped = row.schema.fieldNames.contains("dropped_rows") &&
                Option(row.getAs[java.lang.Long]("dropped_rows"))
                  .exists(_ > 0L)
              val msg = s"observed $name: $row"
              if (dropped) log.warn(msg) else log.debug(msg)
            }
          }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
    }
}
