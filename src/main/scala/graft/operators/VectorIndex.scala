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
}
