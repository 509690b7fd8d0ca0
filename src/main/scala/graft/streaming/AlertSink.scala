package graft.streaming

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{ForeachWriter, Row}
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** One published alert (topic + payload + the reference's QoS-0/retained
  * channel properties, BME680.java:65,169-170). */
final case class AlertMessage(topic: String, payload: String,
    qos: Int = 0, retained: Boolean = true)

/** The alert-channel abstraction. The reference publishes over paho MQTT
  * (BME680.java:167-176); paho is not on the offline classpath, so the
  * client lives behind this trait — an MQTT implementation is a drop-in
  * (connect ≈ MqttClient.connect, publish ≈ MqttClient.publish). Factories
  * must be serializable: one publisher is built per partition-task on the
  * executor, never shipped from the driver.
  */
trait AlertPublisher {
  def connect(): Unit
  def publish(msg: AlertMessage): Unit
  def close(): Unit
}

/** Test/in-memory publisher: collects into a JVM-global buffer keyed by
  * run id (works on local mode where executors share the JVM — the
  * TopologyTestDriver role from SURVEY.md §5). Thread-safe: partitions
  * publish concurrently. */
final class CollectingPublisher(runId: String) extends AlertPublisher {
  override def connect(): Unit = ()
  override def publish(msg: AlertMessage): Unit =
    CollectingPublisher.buffer(runId).add(msg)
  override def close(): Unit = ()
}

object CollectingPublisher {
  private val buffers =
    new ConcurrentHashMap[String, java.util.Queue[AlertMessage]]()
  private[streaming] def buffer(runId: String) =
    buffers.computeIfAbsent(runId,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[AlertMessage]())
  def messages(runId: String): Seq[AlertMessage] =
    buffer(runId).asScala.toSeq
  def clear(runId: String): Unit = buffers.remove(runId)
}

/** Per-partition sink with the reference's exact channel semantics
  * (BME680.java:139-142,167-176): lazy connect at partition open, QoS-0
  * retained publish, and — crucially — publish failure is LOGGED AND
  * DROPPED, never retried and never failing the task (the reference
  * catches MqttException and moves on). At-least-once end to end, same as
  * the reference's Kafka-Streams default (SURVEY.md §0.6).
  *
  * Rows are expected shaped (key, temp, alert) from Pipelines.alerts; the
  * payload is the alert text.
  */
final class AlertForeachWriter(topic: String,
    newPublisher: () => AlertPublisher)
  extends ForeachWriter[Row] with Logging {

  @transient private var publisher: AlertPublisher = _

  override def open(partitionId: Long, epochId: Long): Boolean = {
    publisher = newPublisher()
    publisher.connect()
    true
  }

  override def process(row: Row): Unit = {
    val msg = AlertMessage(topic, row.getAs[String]("alert"))
    try publisher.publish(msg)
    catch {
      case e: Exception =>
        logError(s"alert publish failed (dropped, QoS0 semantics): $msg", e)
    }
  }

  override def close(errorOrNull: Throwable): Unit =
    if (publisher != null) publisher.close()
}
