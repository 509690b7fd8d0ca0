package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference topology as a Structured Streaming job
  * (BME680.java:223-244): one source fanned out to (a) an unmodified
  * pass-through sink and (b) the alert pipeline into an MQTT-shaped sink.
  *
  * The source is injectable: production wires `kafkaSource` (topic
  * `bme680`, String key/value — BME680.java:53,215-216); tests inject a
  * MemoryStream frame. Both branches run off the SAME source DataFrame —
  * Spark plans two independent queries, each reading its own offsets, so
  * the pass-through receives every record even when the alert branch
  * filters (fan-out, not a chain — SURVEY.md §0.1).
  */
object AlertStreamJob {

  // one ops listener per session, however many jobs start (R13 parity:
  // the reference's single Timer thread, BME680.java:220-221)
  private val opsRegistered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Attach the per-micro-batch ops listener once per session. */
  def ensureOpsListener(spark: SparkSession): Unit =
    if (opsRegistered.add(spark)) spark.streams.addListener(new OpsListener)

  private val hookInstalled = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** R12 — graceful shutdown, parity with the reference's JVM hook that
    * closes the streams runtime then disconnects the publisher
    * (BME680.java:233-240,248-252): on SIGTERM/exit, stop every active
    * streaming query (each stop drains the in-flight micro-batch and
    * closes its sinks — AlertForeachWriter.close releases the
    * publisher), then stop the session. Installed once per session. */
  def installShutdownHook(spark: SparkSession): Unit =
    if (hookInstalled.add(spark))
      sys.addShutdownHook { stopAll(spark); spark.stop() }

  /** Stop all active queries; never throws (shutdown-path safe). */
  def stopAll(spark: SparkSession): Unit =
    spark.streams.active.foreach { q =>
      try q.stop() catch { case _: Throwable => () }
    }

  /** Kafka source for the reference's deployment (topic `bme680`,
    * String key/value — BME680.java:53,215-216). Fails fast with
    * guidance when spark-sql-kafka is absent (offline test image). */
  def kafkaSource(spark: SparkSession, bootstrap: String,
      topic: String = "bme680"): DataFrame = {
    KafkaIntegration.requireConnector()
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .load()
      .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
  }

  /** The reference topology end-to-end against a Kafka deployment:
    * consume `inTopic`, re-publish the unmodified stream to `outTopic`
    * (R2, Kafka sink), alert branch to the MQTT-shaped publisher (R10).
    * Runs on the default micro-batch trigger — the run-forever analog
    * of the reference's latch.await() loop (BME680.java:244). Requires
    * the spark-sql-kafka connector; fails fast otherwise. */
  def startKafka(spark: SparkSession, bootstrap: String,
      inTopic: String, outTopic: String, alertTopic: String,
      newPublisher: () => AlertPublisher, checkpointRoot: String,
      jsonPath: String = "$.bme680_tempf"): (StreamingQuery, StreamingQuery) = {
    KafkaIntegration.requireConnector()
    val records = kafkaSource(spark, bootstrap, inTopic)
    graft.tools.Diagnostics.startupBanner(spark)
    ensureOpsListener(spark)
    installShutdownHook(spark)
    val pass = KafkaIntegration.writeKafka(Pipelines.passthrough(records),
      bootstrap, outTopic, s"$checkpointRoot/pass")
    val alerts = Pipelines.alerts(records, jsonPath).writeStream
      .foreach(new AlertForeachWriter(alertTopic, newPublisher))
      .option("checkpointLocation", s"$checkpointRoot/alerts")
      .start()
    (pass, alerts)
  }

  /** Start both branches; returns (passthroughQuery, alertQuery). */
  def start(records: DataFrame, alertTopic: String,
      newPublisher: () => AlertPublisher, checkpointRoot: String,
      jsonPath: String = "$.bme680_tempf"): (StreamingQuery, StreamingQuery) = {
    val spark = records.sparkSession
    graft.tools.Diagnostics.startupBanner(spark) // R14: once per session
    ensureOpsListener(spark)
    installShutdownHook(spark)                   // R12: once per session

    val pass = Pipelines.passthrough(records).writeStream
      .format("memory") // production: .format("kafka").option("topic", "bme680out")
      .queryName(s"passthrough_${System.nanoTime()}")
      .option("checkpointLocation", s"$checkpointRoot/pass")
      .trigger(Trigger.AvailableNow())
      .start()

    val alerts = Pipelines.alerts(records, jsonPath).writeStream
      .foreach(new AlertForeachWriter(alertTopic, newPublisher))
      .option("checkpointLocation", s"$checkpointRoot/alerts")
      .trigger(Trigger.AvailableNow())
      .start()

    (pass, alerts)
  }
}
