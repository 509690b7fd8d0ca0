package graft.streaming

import graft.sources.Warehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental materialized-aggregate maintenance — the streaming twin
  * of a grouped rollup (`q_pricing_summary`-shaped): keep
  * `(group, n_rows, sum_value)` current against a keyed CDC stream
  * WITHOUT re-aggregating the whole table per micro-batch.
  *
  * Strategy: partial recompute, not delta arithmetic. Delta-IVM
  * (sum += new − old) is fragile under CDC realities — deletes,
  * re-inserts, a key MOVING between groups, duplicate changes inside
  * one batch. Instead each batch:
  *
  *  1. derives its AFFECTED GROUP set — the groups its keys belong to
  *     AFTER the apply plus the groups those keys belonged to BEFORE
  *     (a moved key dirties both sides) — from the batch and the live
  *     keyed generation, before applying;
  *  2. folds the batch into the keyed table via the [[CdcApply]] loop
  *     (latest-per-key, merge, anti-join deletes, bucketed
  *     generation);
  *  3. re-aggregates ONLY the affected groups from the new keyed
  *     generation (a semi-join-pruned grouped sum in DECIMAL — the
  *     engine's determinism stance);
  *  4. lands `(untouched agg rows) ∪ (recomputed rows)` as a new agg
  *     generation — groups that emptied vanish naturally because the
  *     recompute produces no row for them.
  *
  * Cost per batch rides |affected groups|' data, not table size; the
  * aggregate table itself is |groups| rows. State lives in the
  * warehouse (both generations), restart-safe via [[AggMaintain.resume]].
  */
final class AggMaintain private (
    baseTable: String,
    keyCol: String,
    seqCol: String,
    opCol: String,
    groupCol: String,
    valueCol: String,
    inner: CdcApply,
    private var generation: Long) {

  private def aggName(g: Long) = s"${baseTable}_agg_g$g"

  /** Current aggregate table (group, n_rows, sum_value), or None
    * before the first batch. */
  def currentAgg(spark: SparkSession): Option[DataFrame] =
    if (generation == 0) None else Some(spark.table(aggName(generation)))

  private def aggregate(rows: DataFrame): DataFrame =
    rows.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast(DecimalType(18, 2))).as("sum_value"))

  /** Apply one CDC micro-batch to BOTH the keyed table and the
    * aggregate. Returns the number of recomputed groups (the
    * incremental-cost observable a monitoring loop wants). */
  def processBatch(batch: DataFrame): Long = synchronized {
    BatchGuard.check(batch, "AggMaintain")
    val spark = batch.sparkSession
    // 1. affected groups = batch keys' groups before AND after. The
    // "after" side comes from the batch payload; the "before" side
    // from the live generation — both tiny relative to the table.
    val batchKeys = batch.select(col(keyCol)).distinct()
    val newGroups = batch.filter(col(opCol) =!= "d")
      .select(col(groupCol)).distinct()
    val oldGroups = inner.current(spark) match {
      case Some(base) => base
        .join(batchKeys, Seq(keyCol), "left_semi")
        .select(col(groupCol)).distinct()
      case None => newGroups.limit(0)
    }
    val affected = newGroups.union(oldGroups).distinct().localCheckpoint()
    // 2. keyed apply (CdcApply's latest-per-key / merge / delete loop)
    inner.processBatch(batch)
    val base = inner.current(spark).get
    // 3. re-aggregate ONLY affected groups from the fresh generation
    val recomputed = aggregate(
      base.join(affected, Seq(groupCol), "left_semi"))
    // 4. carry untouched rows through; land as a new generation
    val next = currentAgg(spark) match {
      case Some(agg) =>
        agg.join(affected, Seq(groupCol), "left_anti").union(recomputed)
      case None => recomputed
    }
    generation += 1
    Warehouse.writeBucketed(next, aggName(generation), groupCol,
      buckets = math.max(2, spark.sparkContext.defaultParallelism / 4))
    if (generation > 1)
      spark.sql(s"DROP TABLE IF EXISTS ${aggName(generation - 1)}")
    affected.count()
  }
}

object AggMaintain {

  /** Fresh maintenance loop: keyed generations under `baseTable`,
    * aggregate generations under `<baseTable>_agg`. */
  def apply(baseTable: String, keyCol: String, seqCol: String,
      opCol: String, groupCol: String, valueCol: String): AggMaintain =
    new AggMaintain(baseTable, keyCol, seqCol, opCol, groupCol, valueCol,
      CdcApply(baseTable, keyCol, seqCol, opCol), generation = 0)

  /** Resume after a restart from the highest surviving generations of
    * both the keyed table and the aggregate. */
  def resume(spark: SparkSession, baseTable: String, keyCol: String,
      seqCol: String, opCol: String, groupCol: String,
      valueCol: String): AggMaintain = {
    val gens = spark.catalog.listTables()
      .filter(col("name").startsWith(s"${baseTable}_agg_g"))
      .collect() // bounded: at most a handful of generation names
      .flatMap(t => t.name.stripPrefix(s"${baseTable}_agg_g").toLongOption)
    new AggMaintain(baseTable, keyCol, seqCol, opCol, groupCol, valueCol,
      CdcApply.resume(spark, baseTable, keyCol, seqCol, opCol),
      generation = if (gens.isEmpty) 0 else gens.max)
  }
}
