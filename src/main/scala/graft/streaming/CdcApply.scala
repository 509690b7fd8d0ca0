package graft.streaming

import graft.operators.RelationalOps
import graft.sources.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming CDC apply — maintain a keyed target table from a change
  * stream (the incremental twin of `q_merge_upsert` / the engine's
  * MERGE): wire [[processBatch]] into `foreachBatch` and each
  * micro-batch folds into the table as
  *
  *  1. collapse the batch to its LATEST change per key (row_number
  *     over (key / seq DESC, tie DESC) — CDC batches carry multiple
  *     changes per key and only the last state may win),
  *  2. upserts merge via ONE full-outer equi-join
  *     ([[RelationalOps.mergeUpsert]]),
  *  3. keys whose latest change is a DELETE (`opCol = 'd'`) leave via
  *     an anti-join,
  *  4. the result lands as a new BUCKETED-by-key generation table
  *     (`<base>_gN` — Spark refuses to overwrite a table its source
  *     plan reads; the superseded generation drops, so exactly one
  *     persists).
  *
  * The bucketed generation is the point at scale: the NEXT batch's
  * merge reads its base side pre-shuffled on the key, so each apply
  * pays one exchange — the (small) change set — exactly the
  * StorageLayoutSpec merge pin, made an operational loop. State lives
  * in the warehouse, not on the driver; a restart resumes from the
  * surviving generation via [[resume]].
  */
final class CdcApply private (
    baseTable: String,
    keyCol: String,
    seqCol: String,
    opCol: String,
    private var generation: Long) {

  /** Current target-table contents (the live generation, or an empty
    * frame before the first batch lands). */
  def current(spark: org.apache.spark.sql.SparkSession): Option[DataFrame] =
    if (generation == 0) None
    else Some(spark.table(s"${baseTable}_g$generation"))

  /** Apply one CDC micro-batch. `batch` must carry `keyCol`, `seqCol`
    * (monotone change order), `opCol` ('u' upsert / 'd' delete) plus
    * the payload columns; the target table carries key + payload. */
  def processBatch(batch: DataFrame): Unit = synchronized {
    BatchGuard.check(batch, "CdcApply")
    val spark = batch.sparkSession
    val payload = batch.columns.filterNot(c => c == seqCol || c == opCol)
    // 1. latest change per key — seq DESC with the full remaining
    // column tuple as tiebreak would be overkill: CDC seq is unique
    // per key by contract, but a stable extra tiebreak keeps a
    // malformed feed deterministic instead of run-dependent
    val w = Window.partitionBy(keyCol)
      .orderBy(col(seqCol).desc, col(opCol).desc)
    val latest = batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val upserts = latest.filter(col(opCol) =!= "d")
      .select(payload.map(col): _*)
    val deletes = latest.filter(col(opCol) === "d")
      .select(col(keyCol).as("__del_key"))
    // 2+3. merge into the live generation (or bootstrap from empty) —
    // the sort-free variant: writeBucketed re-distributes anyway, and
    // update rows win whole-row (a NULL-bearing change clears fields)
    val merged = current(spark) match {
      case Some(base) =>
        RelationalOps.mergeRows(base, upserts, keyCol).drop("action")
      case None => upserts
    }
    val next = merged
      .join(deletes, col(keyCol) === col("__del_key"), "left_anti")
    // 4. land the new generation bucketed on the key; drop the old
    generation += 1
    Warehouse.writeBucketed(next, s"${baseTable}_g$generation", keyCol,
      buckets = spark.sparkContext.defaultParallelism)
    if (generation > 1)
      spark.sql(s"DROP TABLE IF EXISTS ${baseTable}_g${generation - 1}")
  }
}

object CdcApply {

  /** Fresh apply loop writing generations under `baseTable`. */
  def apply(baseTable: String, keyCol: String, seqCol: String,
      opCol: String): CdcApply =
    new CdcApply(baseTable, keyCol, seqCol, opCol, generation = 0)

  /** Resume after a restart from the highest surviving
    * `<base>_gN` generation (0 if none exists — fresh start). */
  def resume(spark: org.apache.spark.sql.SparkSession, baseTable: String,
      keyCol: String, seqCol: String, opCol: String): CdcApply = {
    val gens = spark.catalog.listTables()
      .filter(col("name").startsWith(s"${baseTable}_g"))
      .collect() // bounded: at most a handful of generation names
      .flatMap(t => t.name.stripPrefix(s"${baseTable}_g").toLongOption)
    new CdcApply(baseTable, keyCol, seqCol, opCol,
      generation = if (gens.isEmpty) 0 else gens.max)
  }
}
