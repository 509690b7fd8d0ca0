package graft.tools

import org.apache.spark.sql.DataFrame

/** Plan pinning for iterative / multiply-consumed intermediates.
  *
  * `localCheckpoint` stores blocks on executors with a truncated
  * lineage — the right cost on local mode and for bounded refinements —
  * but a lost executor on a real cluster FAILS the job instead of
  * recomputing (no lineage to replay, no replicas). The
  * reliable-checkpoint spelling writes the blocks to the fault-tolerant
  * store behind `SparkContext.setCheckpointDir` (HDFS/object store) and
  * survives executor loss.
  *
  * [[pin]] picks per session: if the context has a checkpoint dir
  * configured it uses the reliable form, otherwise executor-local
  * blocks. Cluster deployments set the dir once at session build
  * (`spark.sparkContext.setCheckpointDir("hdfs://…/ckpt")`) and every
  * iterative operator ([[graft.operators.DedupOps.nearDupClusters]],
  * the LSH pipeline's pinned intermediates) becomes fault-tolerant with
  * no code change; the driver-contract entry points stay local-fast.
  * Both forms are EAGER (materialize now) and run through
  * `withAction`, so `observe` metrics attached to the plan fire with
  * the first materialization (the convergence-checksum protocol relies
  * on this).
  *
  * Reliable mode runs TWO jobs (Spark's `ReliableRDDCheckpointData`
  * writes checkpoint files in a separate job after the eager action
  * computes the RDD), so [[pin]] persists the plan around the
  * checkpoint write: the second job reads cached blocks instead of
  * re-executing the plan — halving the compute per pinned round and
  * keeping `observe` accumulators (convergence checksums, dropped-pair
  * WARN counts) single-counted, since a cached read skips the
  * instrumented computation.
  */
object Checkpoints {

  /** Materialize `df` as stored blocks with a truncated plan —
    * reliable when the session has a checkpoint dir, local otherwise. */
  def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      // Spark's cache manager keys storage by PLAN EQUALITY, so if an
      // equivalent plan is already cached (storageLevel lookup resolves
      // through the cache manager) our unpersist would evict storage
      // the CALLER still relies on — only manage the cache entry when
      // we created it
      val ours =
        df.storageLevel == org.apache.spark.storage.StorageLevel.NONE
      if (ours)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try df.checkpoint(eager = true)
      finally if (ours) df.unpersist(blocking = false)
    } else df.localCheckpoint(eager = true)
}
