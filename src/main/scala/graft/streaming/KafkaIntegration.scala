package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** R1/R2 Kafka connector integration, optional-classpath style (the R10
  * treatment [[MqttPublisher]] got): the spark-sql-kafka connector is not
  * on the offline test classpath, so every entry point here
  *   - detects the connector (`available`) instead of assuming it,
  *   - fails fast with actionable guidance when absent
  *     (`requireConnector`), and
  *   - keeps the Spark-side wiring (source options, cast projection,
  *     sink (key, value) contract) in PURE functions that tests assert
  *     offline, so a deployment with the connector present is proven
  *     wired, not assumed.
  *
  * Reference wiring: consume topic `bme680`, re-publish the unmodified
  * stream to `bme680out`, alert branch to MQTT (BME680.java:215-216,
  * 224,227).
  */
object KafkaIntegration {

  private val ProviderClass =
    "org.apache.spark.sql.kafka010.KafkaSourceProvider"

  /** True when the spark-sql-kafka connector is on the classpath. */
  def available: Boolean =
    try { Class.forName(ProviderClass); true }
    catch { case _: ClassNotFoundException => false }

  /** Fail fast — an absent connector should name its remedy, not
    * surface as a lookup error deep inside stream start. */
  def requireConnector(): Unit =
    if (!available) throw new IllegalStateException(
      "spark-sql-kafka connector is not on the classpath; deploy with " +
        "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark.version> to " +
        "run the Kafka source/sink (reference topology: BME680.java:224,227)")

  /** The Kafka SINK projection contract: exactly (key, value), both
    * string-castable — pure, assertable offline. */
  def toKafkaFrame(df: DataFrame, keyCol: String = "key",
      valueCol: String = "value"): DataFrame =
    df.select(col(keyCol).cast("string").as("key"),
      col(valueCol).cast("string").as("value"))

  /** Continuous re-publish of a (key, value) frame to a Kafka topic —
    * the R2 pass-through sink in its production form. */
  def writeKafka(frame: DataFrame, bootstrap: String, topic: String,
      checkpoint: String): StreamingQuery = {
    requireConnector()
    toKafkaFrame(frame).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
