package graft.streaming

import graft.functions.TextHashOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document deduplication — the stream-time rendering of the
  * batch dedup family (graft.operators.DedupOps), for pipelines that
  * curate documents as they arrive rather than in a later batch sweep.
  *
  * Both filters are `dropDuplicatesWithinWatermark` over a fingerprint
  * column: a duplicate arriving within the watermark horizon of its
  * first occurrence is dropped, and state for closed horizons is
  * evicted — O(distinct fingerprints per horizon) state at any stream
  * rate. (Plain `dropDuplicates` on a key that excludes the event-time
  * column would never evict state even with a watermark set; the
  * WithinWatermark variant is the key-only-dedup-with-TTL operator.)
  * Fingerprints are narrow per-row codegen'd expressions
  * (no aggregation before the dedup operator, as append-mode streaming
  * requires).
  *
  *  - [[exactDupFilter]] keys on md5 of the normalized text — the
  *    streaming twin of q_doc_dedup's digest groups (first occurrence
  *    kept, byte-identical duplicates dropped).
  *  - [[nearDupFilter]] keys on the MinHash signature computed by
  *    [[graft.functions.MinHashSig]]: two documents share the full
  *    r-permutation signature with probability j^r (j = shingle-set
  *    Jaccard), so r tunes sensitivity — r=32 drops exact and
  *    VERY-near duplicates (j≈1: boilerplate with trivial edits),
  *    smaller r drops more aggressively (r=8 catches j≥0.9 with ~43%
  *    probability per pair). Probabilistic BY DESIGN — the streaming
  *    analog can miss a near-dup the batch LSH verify would pair;
  *    recall-certain near-dup mining stays a batch operator.
  */
object StreamingDedup {

  /** Fingerprint column for [[nearDupFilter]]: the `perms`-permutation
    * MinHash signature rendered as one string key (single evaluation of
    * the signature expression; string keys are state-store friendly). */
  def signatureKey(text: org.apache.spark.sql.Column, k: Int = 3,
      perms: Int = 32): org.apache.spark.sql.Column =
    TextHashOps.minhashSig(text, k, perms).cast("string")

  /** Drop byte-identical (normalized) duplicate documents from a
    * stream. `tsCol` must be the event-time column; `watermark` bounds
    * dedup state (and how late a duplicate can still be caught). */
  def exactDupFilter(stream: DataFrame, textCol: String, tsCol: String,
      watermark: String): DataFrame =
    stream
      .withColumn("graft_fp", md5(lower(trim(col(textCol)))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("graft_fp")
      .drop("graft_fp")

  /** Drop near-duplicate documents from a stream by MinHash-signature
    * equality (see class doc for the j^perms sensitivity trade). */
  def nearDupFilter(stream: DataFrame, textCol: String, tsCol: String,
      watermark: String, k: Int = 3, perms: Int = 32): DataFrame = {
    TextHashOps.register(stream.sparkSession)
    stream
      .withColumn("graft_fp", signatureKey(col(textCol), k, perms))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("graft_fp")
      .drop("graft_fp")
  }

  /** Streaming dedup against a persisted HISTORICAL index — the gap
    * the watermark filters above cannot cover: their state holds only
    * what arrived inside the current horizon, so a document duplicating
    * last month's corpus sails through. [[IndexDedupFilter]] probes a
    * [[graft.operators.VectorIndex]] of the historical corpus instead
    * (each micro-batch is ONE
    * [[graft.operators.VectorIndex.knnJoinWith]] equi-join — the
    * batch-serving shape, never per-row lookups) and appends each
    * batch's novel vectors, so a batch-2 near-duplicate of a batch-1
    * arrival is caught too. Any index family backs the filter —
    * [[graft.operators.AnnIndex]] (LSH), [[graft.operators.IvfIndex]],
    * or [[graft.operators.IvfPqIndex]] (the best recall-per-byte at
    * scale) — pick by corpus; all three share the probe-and-append
    * contract. Use from `writeStream.foreachBatch` (index mutation is
    * driver-side state — exactly what foreachBatch exists for). */
  def againstIndex(index: graft.operators.VectorIndex, idCol: String,
      embCol: String, threshold: Double): IndexDedupFilter =
    new IndexDedupFilter(index, idCol, embCol, threshold)

  /** TEXT twin of [[againstIndex]]: dedup arriving documents against a
    * historical corpus by EXACT normalized-text digest. The corpus is
    * rendered once to its distinct md5 fingerprint set (hash-
    * partitioned on the digest and persisted, so each micro-batch's
    * anti-join reuses that layout and shuffles only the batch);
    * novel fingerprints accumulate per batch, so a batch-2 copy of a
    * batch-1 arrival is caught. Deterministic and exact — the
    * streaming rendering of `q_doc_dedup`'s digest groups. */
  def exactAgainstCorpus(history: DataFrame,
      textCol: String): FingerprintDedupFilter =
    new FingerprintDedupFilter(history, textCol,
      t => md5(lower(trim(t))))

  /** Near-dup variant of [[exactAgainstCorpus]]: fingerprints are the
    * `perms`-permutation MinHash [[signatureKey]], so arrivals whose
    * FULL signature matches any historical (or earlier-arrived)
    * document drop — the j^perms sensitivity trade of
    * [[nearDupFilter]], now with unbounded history instead of a
    * watermark horizon. Probabilistic by design. */
  def nearAgainstCorpus(history: DataFrame, textCol: String,
      k: Int = 3, perms: Int = 32): FingerprintDedupFilter = {
    TextHashOps.register(history.sparkSession)
    new FingerprintDedupFilter(history, textCol,
      t => signatureKey(t, k, perms))
  }
}

/** foreachBatch consumer deduplicating arriving documents against the
  * fingerprint set of a historical corpus plus everything that arrived
  * before them: per batch, one anti-join of the batch's fingerprints
  * against the accumulated set (batch-internal copies collapse to one
  * surviving row first), then the batch's novel fingerprints join the
  * set. Exactness rides the fingerprint: md5 digests are exact,
  * MinHash signature keys are the probabilistic near-dup trade.
  *
  * Scale shape: the historical set is distinct fingerprints only (16
  * bytes a document), hash-partitioned once and persisted — a
  * micro-batch anti-join reuses that partitioning and shuffles only
  * the (small) batch side. Per-batch novel sets chain as narrow
  * unions; long streams compact by writing the fingerprint set to a
  * bucketed warehouse table ([[graft.sources.Warehouse.writeBucketed]]
  * on the digest) and restarting the filter from it.
  */
final class FingerprintDedupFilter private[streaming] (
    history: DataFrame, textCol: String,
    fp: org.apache.spark.sql.Column => org.apache.spark.sql.Column) {

  import org.apache.spark.storage.StorageLevel

  // NULL-safe fingerprint (the funnelReport stance): a NULL text would
  // yield a NULL fingerprint that no equi-join matches — the row would
  // neither emit as novel nor dedup, and a NULL key row would re-enter
  // the set every batch. Coalesce to a sentinel no digest can equal.
  private def fpOf(t: org.apache.spark.sql.Column) =
    coalesce(fp(t), lit("graft_null"))

  // every persisted frame this filter creates, releasable via close()
  private val pinned =
    scala.collection.mutable.ArrayBuffer[DataFrame]()

  @volatile private var keys: DataFrame = {
    val spark = history.sparkSession
    val k = history.select(fpOf(col(textCol)).as("graft_fp")).distinct()
      .repartition(spark.sparkContext.defaultParallelism, col("graft_fp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    pinned.synchronized { pinned += k }
    k
  }

  /** The accumulated fingerprint set (history + novel arrivals). */
  def fingerprints: DataFrame = keys

  // auto-compaction state (see withAutoCompaction)
  @volatile private var compactEvery = 0
  @volatile private var compactBase: String = _
  private var batches = 0L
  private var generation = 0L

  /** Turn on AUTOMATIC compaction of the fingerprint chain: every
    * `everyN` processed batches the accumulated set (history + all
    * novel increments) is collapsed into one bucketed warehouse table
    * (generations write to an INCREMENTING `<base>_g<N>` name —
    * Spark refuses to overwrite a table its source plan still reads —
    * and the superseded generation is dropped, so at most two exist
    * transiently and exactly one persists) and the filter reloads
    * from it — the per-batch union chain the class doc describes goes
    * back to depth 0 and every superseded pinned frame is released.
    * The manual recipe (write the set, restart the filter from it),
    * made an operational default instead of a footgun. Returns this
    * filter for chaining at construction:
    * `StreamingDedup.exactAgainstCorpus(h, "text")
    *   .withAutoCompaction("fp_set", 64)`.
    *
    * Lifecycle caveats: a [[fingerprints]] handle taken BEFORE a
    * compaction reads the generation table that the SECOND-next
    * compaction drops — treat handles as valid only until the next
    * compaction boundary. The FINAL generation table (live state)
    * intentionally survives [[close]]; drop `<base>_g<last>` when the
    * stream is truly done. */
  def withAutoCompaction(baseTable: String, everyN: Int): this.type = {
    require(everyN > 0, "everyN must be positive")
    compactBase = baseTable
    compactEvery = everyN
    this
  }

  /** Collapse the accumulated fingerprint chain into a bucketed
    * warehouse table NOW and reload from it (used by
    * [[withAutoCompaction]]; callable directly for manual control).
    * After the call [[fingerprints]] is one bucketed table scan. */
  def compact(baseTable: String): Unit = synchronized {
    val spark = history.sparkSession
    generation += 1
    val table = s"${baseTable}_g$generation"
    graft.sources.Warehouse.writeBucketed(keys, table, "graft_fp",
      buckets = spark.sparkContext.defaultParallelism)
    val reloaded = spark.table(table)
      .persist(StorageLevel.MEMORY_AND_DISK)
    pinned.synchronized {
      pinned.foreach(_.unpersist(blocking = false))
      pinned.clear()
      pinned += reloaded
    }
    keys = reloaded
    if (generation > 1)
      spark.sql(s"DROP TABLE IF EXISTS ${baseTable}_g${generation - 1}")
  }

  /** Process one micro-batch: returns its NOVEL rows — no fingerprint
    * match in the accumulated set, ONE surviving row per fingerprint
    * within the batch (an arbitrary representative, the
    * `dropDuplicates` contract — pre-sort or pre-collapse the batch if
    * a specific copy must win) — and accumulates their fingerprints.
    * With [[withAutoCompaction]] configured, every N-th batch also
    * collapses the accumulated set. */
  def processBatch(batch: DataFrame): DataFrame = {
    BatchGuard.check(batch, "FingerprintDedupFilter")
    // compaction runs at the START of the batch FOLLOWING each N-th:
    // the rows returned below stay lazy until the foreachBatch callback
    // consumes them, so nothing may unpersist their lineage mid-flight
    if (compactEvery > 0 && batches > 0 && batches % compactEvery == 0)
      compact(compactBase)
    batches += 1
    val b = batch.withColumn("graft_fp", fpOf(col(textCol)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // ONLY the novel fingerprint set is pinned long-term: pinning the
    // full novel rows would grow executor storage with document bytes,
    // not the documented 16 bytes a document. The returned rows
    // re-evaluate from the bounded micro-batch source — consume them
    // inside the foreachBatch callback.
    val novelFps = b.join(keys, Seq("graft_fp"), "left_anti")
      .select("graft_fp").distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    novelFps.count() // materialize against the PRE-accumulation key set
    pinned.synchronized { pinned += novelFps }
    keys = keys.unionByName(novelFps)
    val novel = b.join(novelFps, Seq("graft_fp"))
      .dropDuplicates("graft_fp")
      .drop("graft_fp")
    b.unpersist(blocking = false)
    novel
  }

  /** Adapter for `writeStream.foreachBatch`. */
  def foreachBatch(onNovel: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch, batchId) => onNovel(processBatch(batch), batchId)

  /** Release every persisted frame this filter pinned (the history
    * key set + each batch's novel fingerprints). Call when the stream
    * ends; the filter must not process further batches after. */
  def close(): Unit = pinned.synchronized {
    pinned.foreach(_.unpersist(blocking = false))
    pinned.clear()
  }
}

/** foreachBatch consumer deduplicating arriving vectors against a
  * growing historical [[graft.operators.VectorIndex]] (any family —
  * LSH, IVF, IVF-PQ): per batch, one index-probing kNN equi-join
  * flags rows whose best indexed neighbor reaches `threshold` cosine;
  * the survivors are then deduplicated WITHIN the batch (near-dup
  * pairs arriving together — an LSH self-probe of the batch keeps the
  * lowest id of each near-dup group, so the first batch of a stream
  * cannot absorb a backlog's duplicate pairs wholesale); what remains
  * is appended to the index before the next batch (so in-stream
  * duplicates across batches are caught). Probabilistic exactly as
  * the underlying index probes are — recall is gated in
  * StreamingSpec/SimilaritySpec. The intra-batch pass ranks each row
  * against its [[IndexDedupFilter.IntraK]] best batch neighbors: a
  * near-dup group wider than that budget can over-survive (the
  * members' shortlists may all fill with higher-cosine large-id
  * twins) — the same candidate-set approximation the index itself
  * makes.
  *
  * Each batch's novel rows stay persisted: they back the appended
  * rows of the in-memory index chain. Long streams compact through
  * [[withAutoCompaction]] (or manually through the family's
  * `writeTable` / `appendTable`).
  */
final class IndexDedupFilter private[streaming] (
    initial: graft.operators.VectorIndex, idCol: String, embCol: String,
    threshold: Double) {

  @volatile private var idx = initial
  // every persisted frame this filter pinned, releasable via close():
  // append() returns a new handle over a UNION plan, so close() on the
  // final index would unpersist nothing (exact-plan matching) — the
  // initial backing table and each batch's novel rows must be
  // released individually
  private val pinned =
    scala.collection.mutable.ArrayBuffer[DataFrame](initial.backing)

  /** The current index (initial corpus + every processed batch's
    * novel vectors). */
  def index: graft.operators.VectorIndex = idx

  // auto-compaction state — the vector twin of
  // FingerprintDedupFilter.withAutoCompaction
  @volatile private var compactEvery = 0
  @volatile private var compactBase: String = _
  private var batches = 0L
  private var generation = 0L

  /** Turn on AUTOMATIC compaction of the index's append chain: every
    * `everyN` processed batches the accumulated index (initial corpus
    * + all novel arrivals) is collapsed into one bucketed warehouse
    * index table (an INCREMENTING `<base>_g<N>` name — the reloaded
    * index reads the table it came from, so the next generation must
    * be a new table; the superseded one is dropped, table + `_meta`
    * sidecar) via the family's
    * [[graft.operators.VectorIndex.writeTable]], and the filter
    * reloads from it through [[graft.operators.VectorIndex.detect]] —
    * the per-batch union chain goes back to depth 0 and every
    * superseded pinned frame is released. Works whichever family
    * backs the filter. The manual `writeTable`/`appendTable` recipe,
    * made an operational default.
    *
    * Lifecycle caveats (shared with the fingerprint twin): an
    * [[index]] handle taken before a compaction reads a generation
    * table that the second-next compaction DROPS — treat handles as
    * valid only until the next compaction boundary. The final
    * generation (live state) survives [[close]]; drop it when the
    * stream is done. The reloaded backing is re-persisted
    * MEMORY_AND_DISK because every subsequent batch probes it — the
    * entry is LRU-evictable and recomputes as a bucketed table scan,
    * so eviction degrades to disk reads, never to replaying the
    * append chain. */
  def withAutoCompaction(baseTable: String, everyN: Int): this.type = {
    require(everyN > 0, "everyN must be positive")
    compactBase = baseTable
    compactEvery = everyN
    this
  }

  /** Collapse the index's append chain into a bucketed warehouse
    * index table NOW and reload from it (used by
    * [[withAutoCompaction]]; callable directly for manual control).
    * After the call [[index]] probes one bucketed table scan. */
  def compact(baseTable: String): Unit = synchronized {
    import org.apache.spark.storage.StorageLevel
    val spark = idx.backing.sparkSession
    generation += 1
    val table = s"${baseTable}_g$generation"
    idx.writeTable(table, buckets = spark.sparkContext.defaultParallelism)
    val reloaded = graft.operators.VectorIndex.detect(spark, table)
      .getOrElse(throw new IllegalStateException(
        s"just-written index table $table did not reopen — " +
          s"${table}_meta missing or of unrecognized shape"))
    reloaded.backing.persist(StorageLevel.MEMORY_AND_DISK)
    pinned.synchronized {
      pinned.foreach(_.unpersist(blocking = false))
      pinned.clear()
      pinned += reloaded.backing
    }
    idx = reloaded
    if (generation > 1) {
      spark.sql(s"DROP TABLE IF EXISTS ${baseTable}_g${generation - 1}")
      spark.sql(s"DROP TABLE IF EXISTS ${baseTable}_g${generation - 1}_meta")
    }
  }

  /** Process one micro-batch: returns its NOVEL rows (no indexed
    * neighbor at ≥ `threshold` cosine, and not a near-dup of a
    * lower-id row in the SAME batch) and appends them to the index.
    * With [[withAutoCompaction]] configured, every N-th batch also
    * collapses the append chain. */
  def processBatch(batch: DataFrame): DataFrame = {
    BatchGuard.check(batch, "IndexDedupFilter")
    import org.apache.spark.storage.StorageLevel
    // compaction runs at the START of the batch FOLLOWING each N-th
    // (the fingerprint twin's stance): the previous batch's returned
    // rows stay lazy until the foreachBatch callback consumes them, so
    // nothing may unpersist their lineage mid-flight
    if (compactEvery > 0 && batches > 0 && batches % compactEvery == 0)
      compact(compactBase)
    batches += 1
    val b = batch.persist(StorageLevel.MEMORY_AND_DISK)
    val dupIds = idx.knnJoinWith(b, idCol, embCol, k = 1)
      .filter(col("cos_sim") >= threshold)
      .select(col("src_id").as(idCol))
    val survivors = b.join(dupIds, Seq(idCol), "left_anti")
    // intra-batch pass: an LSH self-probe of the index survivors (one
    // narrow signature pass + one bucket equi-join — LSH because it
    // needs no training, whatever family backs the HISTORICAL index);
    // a row with a ≥ threshold neighbor of SMALLER id in the same
    // batch drops — the keep-lowest-id contract of the batch dedup
    // family's connected components
    val batchIdx = graft.operators.AnnIndex.build(survivors, idCol, embCol,
      tables = 16, persist = false)
    val intraDup = batchIdx
      .knnJoinWith(survivors, idCol, embCol, k = IndexDedupFilter.IntraK)
      .filter(col("cos_sim") >= threshold && col("dst_id") < col("src_id"))
      .select(col("src_id").cast(
        survivors.schema(idCol).dataType).as(idCol))
      .distinct()
    val novel = survivors.join(intraDup, Seq(idCol), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    novel.count() // materialize NOW: the probe must see the pre-append index
    pinned.synchronized { pinned += novel }
    idx = idx.append(novel, idCol, embCol)
    b.unpersist(blocking = false)
    novel
  }

  /** Adapter for `writeStream.foreachBatch`: dedups each micro-batch
    * and hands the novel remainder to `onNovel`. */
  def foreachBatch(onNovel: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch, batchId) => onNovel(processBatch(batch), batchId)

  /** Release every persisted frame this filter pinned (the initial
    * backing table + each batch's novel rows). Call when the stream
    * ends; the filter must not process further batches after. */
  def close(): Unit = pinned.synchronized {
    pinned.foreach(_.unpersist(blocking = false))
    pinned.clear()
  }
}

object IndexDedupFilter {
  /** Neighbor budget of the intra-batch self-probe: each surviving row
    * checks its IntraK best batch neighbors for a smaller-id near-dup.
    * Groups wider than this can over-survive (never over-drop). */
  val IntraK = 8
}
