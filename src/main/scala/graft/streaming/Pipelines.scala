package graft.streaming

import graft.operators.ReferenceOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared transforms consumed by BOTH the batch queries (SparkEntry) and
  * the streaming jobs/tests — one logical plan, two execution modes
  * (Structured Streaming's unified-API guarantee). This is the Spark
  * rendering of the reference topology (BME680.java:223-229): a source
  * fanned out to an unmodified pass-through and an alert branch.
  *
  * Batch is the semantic spec; `readStream` runs the identical unresolved
  * plan incrementally. Everything here is narrow (no shuffle), so a
  * streaming micro-batch over 1000 executors never exchanges data —
  * per-partition pipelines just like the reference's per-record loop, but
  * vectorized and codegen'd.
  */
object Pipelines {

  /** Pass-through branch (BME680.java:227): the ORIGINAL record, untouched,
    * regardless of what the alert branch does. Expects (key, value). */
  def passthrough(records: DataFrame): DataFrame =
    records.select(col("key"), col("value"))

  /** Alert branch (BME680.java:136-178): dual-branch extract → cast →
    * strict >75.0 → Formatter-exact text. Emits (key, temp, alert). */
  def alerts(records: DataFrame,
             jsonPath: String = "$.bme680_tempf"): DataFrame = {
    val temp = ReferenceOps.extractTemp(col("value"), jsonPath)
    records
      .select(col("key"), temp.as("temp"))
      .filter(col("temp") > lit(75.0))
      .select(col("key"), col("temp"),
        ReferenceOps.alertText(col("temp")).as("alert"))
  }
}
