package graft.operators

import org.apache.spark.sql.DataFrame

/** The probe-and-append contract every ANN index family implements —
  * [[AnnIndex]] (hyperplane LSH), [[IvfIndex]] (coarse quantizer +
  * sketch), [[IvfPqIndex]] (coarse quantizer + residual PQ) — so
  * consumers that serve a growing corpus (the streaming dedup filter,
  * [[graft.streaming.StreamingDedup.againstIndex]]) can run on
  * whichever index offers the best recall-per-byte for their data
  * without caring which family backs it.
  *
  *  - [[knnJoinWith]] is the BATCH-serving probe: one equi-join pass
  *    of an external query set against the index at the family's
  *    default probe budget (bucket join for LSH, cell fan-out +
  *    partial top-k for the IVF family), returning
  *    `(src_id, dst_id, cos_sim, rn)` with EXACT rescored cosines —
  *    only the candidate SET is approximate.
  *  - [[append]] grows the index with new vectors WITHOUT retraining
  *    (fixed hyperplanes / fixed quantizers), returning a new handle
  *    over the union; the original handle stays valid.
  *  - [[backing]] is the index's persisted storage frame, exposed so
  *    lifecycle owners can pin/release it
  *    ([[graft.streaming.IndexDedupFilter.close]]).
  */
trait VectorIndex {

  /** Approximate kNN join of an external query set against the index
    * at the family's default probe budget. Ids must be integral; query
    * vectors that are themselves indexed return as their own cos=1
    * neighbor. */
  def knnJoinWith(queries: DataFrame, idCol: String, embCol: String,
      k: Int): DataFrame

  /** A new index over this index's vectors plus `newVectors`, encoded
    * under the EXISTING index parameters (no retraining). */
  def append(newVectors: DataFrame, idCol: String,
      embCol: String): VectorIndex

  /** The index's backing storage frame (signature table / inverted
    * file) — for lifecycle owners that pin and release it. */
  private[graft] def backing: DataFrame

  /** Persist the index as a bucketed warehouse table plus its `_meta`
    * sidecar (the family-specific parameters probes must reopen
    * with). [[VectorIndex.detect]] reopens the right family from the
    * sidecar alone — the durable half of the probe-and-append
    * contract, and what lets a family-agnostic consumer
    * ([[graft.streaming.IndexDedupFilter]]'s auto-compaction) collapse
    * an in-memory append chain without knowing which index backs it. */
  def writeTable(table: String, buckets: Int = 32): Unit
}

object VectorIndex {

  import org.apache.spark.sql.SparkSession

  /** Reopen a durable index table written by any family's
    * [[VectorIndex.writeTable]], dispatching on the `_meta` sidecar's
    * schema (each family's sidecar shape is unique). Returns None when
    * the sidecar is missing or matches no family — a COINCIDENTAL
    * `<table>_meta` a caller may treat as "not an index table" rather
    * than an error (the knn_join TVF falls back to a one-shot build). */
  def detect(spark: SparkSession, table: String): Option[VectorIndex] =
    if (!spark.catalog.tableExists(table + "_meta")) None
    else spark.table(table + "_meta").columns.toSeq match {
      case Seq("tables", "planes_per_table") =>
        Some(AnnIndex.fromTable(spark, table))
      case Seq("cell", "centroid", "n") =>
        Some(IvfIndex.fromTable(spark, table))
      case Seq("kind", "i", "j", "centroid", "n") =>
        Some(IvfPqIndex.fromTable(spark, table))
      case _ => None
    }
}
