package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming state-store provider selection — the 100 TB state story.
  *
  * Spark's default provider (`HDFSBackedStateStoreProvider`) keeps every
  * stateful operator's working state as an in-heap hash map per
  * partition, with full-snapshot checkpoints. That is fine for the
  * MB-scale state of a demo, but at production scale (a streaming dedup
  * filter or sessionization over months of keys) per-executor state
  * outgrows the heap: GC pauses stretch micro-batches, and an executor
  * OOM loses the partition's map. The engine's stateful surface
  * (windowed aggregation, `dropDuplicates`, stream-stream joins,
  * `flatMapGroupsWithState` — StreamingOps, StatefulOps, StreamingDedup)
  * therefore must also run unchanged on the RocksDB provider that ships
  * in spark-sql (backed by `rocksdbjni`): state lives OFF-heap in a
  * per-partition RocksDB instance (memtable + SST files on local disk),
  * so state size is bounded by disk, not heap, and GC pressure is flat
  * in the key count.
  *
  * Selection is a session conf, not code: every operator in this engine
  * is provider-agnostic, and [[StateStoreSpec]] pins that by running the
  * stateful families under BOTH providers with identical results.
  * Production configs should also enable changelog checkpointing (upload
  * per-batch deltas instead of full SST snapshots — turns checkpoint
  * cost O(state) into O(delta)) and unload-on-commit for short-lived
  * maintenance jobs.
  */
object StateStores {

  /** The off-heap provider shipped in spark-sql (rocksdbjni-backed). */
  val RocksDBProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Spark's in-heap default — named here so configs can flip back
    * explicitly and tests can parametrize over the pair. */
  val DefaultProvider: String =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** A child session (shared SparkContext, isolated SQLConf) whose
    * streaming queries run on the RocksDB state store with changelog
    * checkpointing. The parent session's conf is untouched — the
    * provider class is captured per-query at start, so isolating it in
    * a `newSession` keeps concurrently running queries on their own
    * providers. */
  def rocksDBSession(spark: SparkSession): SparkSession =
    sessionWithProvider(spark, RocksDBProvider)

  /** A child session pinned to `provider` (see [[rocksDBSession]]). */
  def sessionWithProvider(spark: SparkSession, provider: String): SparkSession = {
    val s = spark.newSession()
    s.conf.set(ProviderKey, provider)
    if (provider == RocksDBProvider) {
      // Per-batch changelog uploads instead of full SST snapshots: the
      // checkpoint write is O(batch delta), not O(total state) — the
      // difference between a bounded and an ever-growing commit time as
      // dedup/session state accumulates.
      s.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
    }
    s
  }

  /** The provider class a session's next streaming query would use. */
  def providerOf(spark: SparkSession): String =
    spark.conf.get(ProviderKey, DefaultProvider)
}
