package graft.streaming

import graft.sources.Warehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming SCD-2 — maintain a type-2 history table (validity
  * intervals) incrementally from a change stream: the composition of
  * [[CdcApply]]'s generation-table loop with
  * [[graft.operators.RelationalOps.scd2Build]]'s change-detection
  * semantics. Wire [[processBatch]] into `foreachBatch`; each
  * micro-batch folds in as
  *
  *  1. restrict to the batch's keys: closed versions NEVER change, and
  *     open versions of untouched keys carry through — only the open
  *     row of each affected key is re-derived,
  *  2. re-run scd2 change detection over (that open version ⊕ the new
  *     changes) per key — a lag/lead window over ≤|batch| + |affected
  *     open rows| rows, never the history,
  *  3. land as a new bucketed generation (`<base>_gN`), superseded
  *     generation dropped — the same restart contract as CdcApply
  *     ([[Scd2Apply.resume]] picks up the surviving generation).
  *
  * Equivalence contract (pinned by CdcApplySpec): feeding ANY
  * batch-split of a change set through this loop produces exactly
  * `scd2Build(allChanges)`, PROVIDED batch boundaries respect per-key
  * event-time order (a change may not arrive after a later-timestamped
  * change of the same key has been applied — the standard in-order CDC
  * contract; out-of-order feeds take the batch rebuild instead).
  *
  * Scale: per batch, the history contributes only the open rows of
  * affected keys (a semi-join on the bucketed generation — no shuffle
  * of the base side), the window runs over batch-sized groups, and
  * the generation write re-buckets once. History size never enters
  * the per-batch window.
  */
final class Scd2Apply private (
    baseTable: String,
    keyCol: String,
    valueCol: String,
    tsCol: String,
    tieCol: String,
    private var generation: Long) {

  /** Current history (the live generation), columns
    * (key, value, valid_from, valid_to, src_key, is_current). */
  def current(spark: SparkSession): Option[DataFrame] =
    if (generation == 0) None
    else Some(spark.table(s"${baseTable}_g$generation"))

  /** Apply one micro-batch of changes carrying
    * (`keyCol`, `valueCol`, `tsCol`, `tieCol`). */
  def processBatch(batch: DataFrame): Unit = synchronized {
    BatchGuard.check(batch, "Scd2Apply")
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val changes = batch.select(col(keyCol), col(valueCol),
      col(tsCol), col(tieCol))
    val intervals = current(spark) match {
      case None =>
        graft.operators.RelationalOps
          .scd2Build(changes, keyCol, valueCol, tsCol, tieCol)
      case Some(hist) =>
        val affected = changes.select(keyCol).distinct()
        // open rows of affected keys rejoin the window as pseudo-
        // changes (their original valid_from/src_key ride along so a
        // retained open version keeps its identity bit-for-bit)
        val openAff = hist.filter(col("is_current"))
          .join(affected, keyCol, "left_semi")
          .select(col(keyCol), col(valueCol),
            col("valid_from").as(tsCol), col("src_key").as(tieCol))
        val cand = openAff.unionByName(changes)
        // scd2Build's exact change-detect + interval assembly, over
        // only the affected-key slice
        val rebuilt = graft.operators.RelationalOps
          .scd2Build(cand, keyCol, valueCol, tsCol, tieCol)
        // untouched history: every closed version, plus open versions
        // of keys the batch does not carry
        val untouched = hist.filter(!col("is_current"))
          .unionByName(hist.filter(col("is_current"))
            .join(affected, keyCol, "left_anti"))
        untouched.unionByName(rebuilt)
    }
    generation += 1
    Warehouse.writeBucketed(intervals, s"${baseTable}_g$generation",
      keyCol, buckets = spark.sparkContext.defaultParallelism)
    if (generation > 1)
      spark.sql(s"DROP TABLE IF EXISTS ${baseTable}_g${generation - 1}")
  }
}

object Scd2Apply {

  /** Fresh history loop writing generations under `baseTable`. */
  def apply(baseTable: String, keyCol: String, valueCol: String,
      tsCol: String, tieCol: String): Scd2Apply =
    new Scd2Apply(baseTable, keyCol, valueCol, tsCol, tieCol,
      generation = 0)

  /** Resume after a restart from the highest surviving generation. */
  def resume(spark: SparkSession, baseTable: String, keyCol: String,
      valueCol: String, tsCol: String, tieCol: String): Scd2Apply = {
    val gens = spark.catalog.listTables()
      .filter(col("name").startsWith(s"${baseTable}_g"))
      .collect() // bounded: at most a handful of generation names
      .flatMap(t => t.name.stripPrefix(s"${baseTable}_g").toLongOption)
    new Scd2Apply(baseTable, keyCol, valueCol, tsCol, tieCol,
      generation = if (gens.isEmpty) 0 else gens.max)
  }
}
