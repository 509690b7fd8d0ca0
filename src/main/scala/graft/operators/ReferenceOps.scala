package graft.operators

import graft.Query
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tier A — the reference's entire operator surface (SURVEY.md §2.1,
  * reference pipeline at BME680.java:136-178,223-229) re-expressed as
  * Catalyst expressions over the `events` table. Zero UDFs: every step of
  * the reference's per-record Java code maps to a codegen'd builtin, so the
  * whole flagship runs inside one WholeStageCodegen stage with predicate
  * pushdown intact — the property that makes it scale to 100 TB unchanged.
  */
object ReferenceOps {

  /** The reference's dual-branch temperature extraction
    * (BME680.java:151-157): JSON docs take the JsonPath branch
    * (`$.bme680_tempf` there, `$.k` on the driver's events table); bare
    * numeric strings are trimmed. `try_cast` replaces the reference's
    * uncaught Float.parseFloat (documented deviation, SURVEY.md §7.6).
    */
  def extractTemp(value: Column, jsonPath: String): Column = {
    val raw = when(instr(value, "{") > 0, get_json_object(value, jsonPath))
      .otherwise(value)
    trim(raw).try_cast("double")
  }

  /** Alert projection, byte-identical to the reference's
    * `String.format("Temperature warning %04.2f", v)` (BME680.java:64,161)
    * — format_string delegates to java.util.Formatter, same as the
    * reference's Java 8 runtime.
    */
  def alertText(temp: Column): Column =
    format_string("Temperature warning %04.2f", temp)

  /** Flagship: the complete reference pipeline (R4–R9) as one declarative
    * plan — detect encoding, extract, cast, strict `> 75.0` threshold
    * (BME680.java:68,160), format. Narrow dependencies only: no shuffle
    * except the final presentation sort.
    */
  def alertPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val ev   = Tables.events(spark, sfDir)
    val temp = extractTemp(col("props"), "$.k")
    ev.select(col("event_id"), temp.as("temp"))
      .filter(col("temp") > lit(75.0))
      .select(col("event_id"), col("temp"), alertText(col("temp")).as("alert"))
      .orderBy("event_id")
  }

  /** R1–R10 end-to-end as a REAL incremental execution: file streaming
    * source → the same Pipelines.alerts plan → memory sink. Structured
    * Streaming's unified API means this is the identical logical plan as
    * `alertPipeline`, replanned per micro-batch — so it shares
    * q_alert_pipeline's DuckDB oracle. AvailableNow drains the source and
    * terminates (the batch-bounded analog of the reference's
    * `latch.await()` run-forever loop, BME680.java:244).
    */
  def alertStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Fixed per-session sink name: each start() replaces the memory-sink
    // temp view, so repeated invocations (Profile runs twice, Bench
    // medians) keep at most ONE result copy on the driver heap instead
    // of accumulating one per nanoTime-suffixed name.
    val name = "graft_alert_stream"
    // start() throws if a query with this fixed name is still active
    // (concurrent invocations in one session — parallel tests, harness
    // overlap); stop any straggler first, then drop its view.
    spark.streams.active.filter(q => Option(q.name).contains(name))
      .foreach(_.stop())
    spark.catalog.dropTempView(name)
    // Glob form: FileStreamSource requires its basePath (the non-glob
    // prefix) to be a directory; the driver lays tables out as one
    // parquet FILE per table.
    val records = spark.readStream
      .schema("event_id BIGINT, props STRING")
      .parquet(s"$sfDir/{events}.parquet")
      .selectExpr("CAST(event_id AS STRING) AS key", "props AS value")
    val q = graft.streaming.Pipelines.alerts(records, "$.k")
      .writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .selectExpr("CAST(key AS BIGINT) AS event_id", "temp", "alert")
      .orderBy("event_id")
  }

  val all: Seq[Query] = Seq(
    Query(
      "q_source_scan",
      Some("""SELECT event_id, ts, user_id, event_type, value, props
              FROM events ORDER BY event_id""".stripMargin),
      (s, d) =>
        Tables.events(s, d)
          .select("event_id", "ts", "user_id", "event_type", "value", "props")
          .orderBy("event_id")),
    Query(
      "q_passthrough",
      Some("""SELECT CAST(event_id AS VARCHAR) AS key, props AS value
              FROM events ORDER BY key"""),
      (s, d) =>
        Tables.events(s, d)
          .selectExpr("CAST(event_id AS STRING) AS key", "props AS value")
          .orderBy("key")),
    Query(
      "q_json_detect",
      Some("""SELECT CASE WHEN instr(props, '{') > 0 THEN 'json' ELSE 'bare' END AS branch,
                     count(*) AS n
              FROM events GROUP BY 1 ORDER BY branch"""),
      (s, d) =>
        Tables.events(s, d)
          .groupBy(
            when(instr(col("props"), "{") > 0, "json")
              .otherwise("bare")
              .as("branch"))
          .agg(count(lit(1)).as("n"))
          .orderBy("branch")),
    Query(
      "q_json_extract",
      Some("""SELECT event_id, json_extract_string(props, '$.k') AS k
              FROM events ORDER BY event_id"""),
      (s, d) =>
        Tables.events(s, d)
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").as("k"))
          .orderBy("event_id")),
    Query(
      "q_trim_cast",
      Some("""SELECT event_id,
                     CAST(trim(json_extract_string(props, '$.k')) AS DOUBLE) AS k_num
              FROM events ORDER BY event_id"""),
      (s, d) =>
        Tables.events(s, d)
          .select(
            col("event_id"),
            trim(get_json_object(col("props"), "$.k"))
              .cast("double")
              .as("k_num"))
          .orderBy("event_id")),
    Query(
      "q_threshold_alert",
      Some("""SELECT event_id, user_id, event_type, value
              FROM events WHERE value > 75.0 ORDER BY event_id"""),
      (s, d) =>
        Tables.events(s, d)
          .filter(col("value") > lit(75.0))
          .select("event_id", "user_id", "event_type", "value")
          .orderBy("event_id")),
    Query(
      "q_alert_pipeline",
      Some("""SELECT event_id,
                     CAST(trim(CASE WHEN instr(props, '{') > 0
                               THEN json_extract_string(props, '$.k')
                               ELSE props END) AS DOUBLE) AS temp,
                     printf('Temperature warning %04.2f',
                            CAST(trim(CASE WHEN instr(props, '{') > 0
                                      THEN json_extract_string(props, '$.k')
                                      ELSE props END) AS DOUBLE)) AS alert
              FROM events
              WHERE CAST(trim(CASE WHEN instr(props, '{') > 0
                              THEN json_extract_string(props, '$.k')
                              ELSE props END) AS DOUBLE) > 75.0
              ORDER BY event_id"""),
      (s, d) => alertPipeline(s, d)),
    Query(
      "q_alert_stream",
      Some("""SELECT event_id,
                     CAST(trim(CASE WHEN instr(props, '{') > 0
                               THEN json_extract_string(props, '$.k')
                               ELSE props END) AS DOUBLE) AS temp,
                     printf('Temperature warning %04.2f',
                            CAST(trim(CASE WHEN instr(props, '{') > 0
                                      THEN json_extract_string(props, '$.k')
                                      ELSE props END) AS DOUBLE)) AS alert
              FROM events
              WHERE CAST(trim(CASE WHEN instr(props, '{') > 0
                              THEN json_extract_string(props, '$.k')
                              ELSE props END) AS DOUBLE) > 75.0
              ORDER BY event_id"""),
      (s, d) => alertStream(s, d))
  )
}
