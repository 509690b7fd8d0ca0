package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Materialized multi-table LSH signature index for ANN search.
  *
  * The r01 shape recomputed every vector's signatures per probe and
  * filtered with an OR-of-equalities join predicate — a full scan per
  * query, defeating the point of LSH. Here the signature table
  * `(t, sig, vec_id, embedding)` is computed ONCE (one narrow pass,
  * T rows per vector) and persisted; each probe is then either
  *
  *  - [[AnnIndex.topK]] — a broadcast hash EQUI-join of the T-row probe
  *    signature set against the index on `(t, sig)` (hash-joinable keys,
  *    no nested-loop filter), fully declarative, no driver collect; or
  *  - [[AnnIndex.topKVec]] — the point-query form: the query vector's T
  *    signatures are computed driver-side (it is a single user-supplied
  *    vector) and pushed as literal predicates, so a bucketed/partitioned
  *    index scan prunes to the probe's own buckets — the true index
  *    lookup shape at 100 TB, where reading 8 buckets instead of the
  *    table is the entire value of the structure.
  *
  * Candidates are deduped, exactly rescored by codegen'd cosine, and
  * top-k'd (TakeOrderedAndProject). Persistence: [[AnnIndex.writeTable]]
  * stores the index bucketed by `sig` via [[graft.sources.Warehouse]] so
  * equality/IN probes prune buckets at read time; [[AnnIndex.fromTable]]
  * reopens it.
  *
  * Reference lineage: the reference engine has no vector search; this is
  * part of the LLM-data-pipeline tier (BASELINE.json north_star).
  */
final case class AnnIndex(sigs: DataFrame,
    tables: Int = SimilarityOps.TABLES,
    planesPerTable: Int = SimilarityOps.PLANES_PER_TABLE)
    extends VectorIndex {

  private[graft] override def backing: DataFrame = sigs

  /** [[VectorIndex]] probe at the default bucket cap. */
  override def knnJoinWith(queries: DataFrame, idCol: String,
      embCol: String, k: Int): DataFrame =
    knnJoinWith(queries, idCol, embCol, k, maxBucket = 4096)

  import graft.functions.VectorOps

  /** Top-k neighbors of an indexed vector: broadcast equi-probe, exact
    * rescore, no recomputation of corpus signatures. */
  def topK(probeId: Long, k: Int = 10): DataFrame = {
    val probe = sigs.filter(col("vec_id") === probeId)
      .select(col("t"), col("sig"), col("embedding").as("pe"))
    sigs.filter(col("vec_id") =!= probeId)
      .join(broadcast(probe), Seq("t", "sig"))
      .dropDuplicates("vec_id")
      .select(col("vec_id"),
        round(VectorOps.cosine(col("embedding"), col("pe")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Top-k neighbors of an external query vector: signatures computed
    * driver-side, pushed as literal bucket predicates (prunable on a
    * bucketed index), cosine against the literal vector — zero joins. */
  def topKVec(probe: Seq[Double], k: Int = 10): DataFrame = {
    val sigLits = SimilarityOps.tableSigsOf(probe, tables, planesPerTable)
    val cond = sigLits.zipWithIndex
      .map { case (s, t) => col("t") === lit(t) && col("sig") === lit(s) }
      .reduce(_ || _)
    sigs.filter(cond)
      .dropDuplicates("vec_id")
      .select(col("vec_id"),
        round(VectorOps.cosine(col("embedding"),
          typedLit(probe)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Approximate kNN JOIN through the index: every vector probes its
    * own signature buckets at once — ONE hash equi-join of the
    * signature table against itself on `(t, sig)`, instead of the
    * O(n²) pair space the exact [[SimilarityOps.knnJoin]] must rank.
    * Candidates are exactly rescored with the codegen'd cosine and
    * reduced by the same pre-shuffle partial top-k as the exact join
    * (the aggregator dedups a pair that collides in several tables, so
    * no distinct barrier is needed). Hot buckets — the LSH skew shape —
    * are bounded at `maxBucket` rows: an OVERSIZED BUCKET IS DROPPED IN
    * FULL (its members lose those candidates — on heavy-duplicate
    * corpora where every bucket holding a group overflows, those
    * sources can vanish from the output), with the dropped row count
    * surfaced as an observed metric (WARN on completion, same stance as
    * the minhash band cap): recall loss is explicit, never silent.
    * Heavy-duplicate corpora should collapse exact duplicates first
    * (the [[DedupOps.minhashPairs]] stage-0 shape) or raise the cap.
    *
    * Scale shape: bucket occupancy comes from a SEPARATE (t, sig)-only
    * aggregate — tiny rows through the count exchange, broadcast back
    * as the cap filter — so the embedding-carrying rows cross exactly
    * two exchanges (the two sides of the candidate equi-join) and
    * nothing is checkpointed. Only the probe side needs the filter: a
    * dropped bucket key matches nothing, which drops the bucket's pairs
    * bilaterally.
    *
    * Probabilistic BY DESIGN: a true neighbor sharing no bucket with
    * its source is missed — recall is gated against the exact join in
    * SimilaritySpec (≥0.8@k=5 at the q_knn_ann build parameters), not
    * oracle-hashed. */
  def knnJoin(k: Int, maxBucket: Int = 4096): DataFrame = {
    graft.tools.ObservedMetrics.register(sigs.sparkSession)
    val keep = sigs
      .groupBy("t", "sig").agg(count(lit(1)).as("n"))
      .observe(graft.tools.ObservedMetrics.nextName("graft_ann_overflow"),
        sum(when(col("n") > maxBucket, col("n")).otherwise(lit(0L)))
          .as("dropped_rows"),
        max(col("n")).as("max_bucket"))
      .filter(col("n").between(2, maxBucket))
      .select("t", "sig")
    val lhs = sigs.join(keep, Seq("t", "sig"))
      .select(col("t"), col("sig"),
        col("vec_id").as("src_id"), col("embedding").as("se"))
    val rhs = sigs.select(col("t"), col("sig"),
      col("vec_id").as("dst_id"), col("embedding").as("de"))
    // The candidate self-join is SORT-MERGE by hint: local stats
    // undersize the signature table and AQE picks a broadcast hash
    // join, whose fused probe loop measured ~25× more per match than
    // the sort-merge run iterator on these fat embedding rows (320 vs
    // 13 µs/edge at 4M candidates — stage-metric comparison, r5). At
    // scale both sides are far over any broadcast threshold and
    // sort-merge is what a cluster picks anyway; the hint makes local
    // behavior match the scale plan.
    val edges = lhs.hint("merge").join(rhs, Seq("t", "sig"))
      .filter(col("src_id") =!= col("dst_id"))
      .select(col("src_id"), col("dst_id"),
        round(VectorOps.cosine(col("se"), col("de")), 6).as("cos_sim"))
    SimilarityOps.topKPerSrc(edges, "cos_sim", k)
  }

  /** Approximate kNN JOIN of an EXTERNAL query set against this
    * index — the batch-serving shape: a probe batch (new documents, a
    * request log, a holdout split) finds its neighbors among the
    * indexed corpus in ONE hash equi-join instead of per-vector point
    * lookups. Query vectors compute signatures under the index's own
    * hyperplane budget (same `tables`×`planesPerTable`), join the
    * indexed buckets on `(t, sig)`, are exactly rescored, and reduce
    * through the same pre-shuffle partial top-k. The occupancy cap
    * applies to INDEX buckets only (singleton buckets stay probe-able;
    * oversized ones are dropped in full with the observed-metric WARN,
    * as in [[knnJoin]]).
    *
    * Ids are NOT cross-filtered: probing with vectors that are
    * themselves indexed returns each as its own cos=1 neighbor —
    * callers re-probing corpus vectors drop rank 1 or filter
    * `src_id =!= dst_id`. `idCol` must be an integral type (the typed
    * BIGINT top-k aggregator — [[SimilarityOps.topKPerSrc]]).
    *
    * Returns (src_id = query id, dst_id = indexed id, cos_sim, rn),
    * recall-gated on a held-out probe split in SimilaritySpec. */
  def knnJoinWith(queries: DataFrame, idCol: String, embCol: String,
      k: Int, maxBucket: Int = 4096): DataFrame = {
    graft.tools.ObservedMetrics.register(sigs.sparkSession)
    val keep = sigs
      .groupBy("t", "sig").agg(count(lit(1)).as("n"))
      .observe(graft.tools.ObservedMetrics.nextName("graft_ann_overflow"),
        sum(when(col("n") > maxBucket, col("n")).otherwise(lit(0L)))
          .as("dropped_rows"),
        max(col("n")).as("max_bucket"))
      .filter(col("n") <= maxBucket)
      .select("t", "sig")
    graft.functions.VectorOps.register(sigs.sparkSession)
    val qe = queries.select(col(idCol).as("src_id"),
      col(embCol).cast("array<double>").as("se"))
    val lhs = qe.select(col("src_id"), col("se"),
      posexplode(graft.functions.VectorOps.planeSigs(
        col("se"), 0, tables, planesPerTable)).as(Seq("t", "sig")))
    val rhs = sigs.join(keep, Seq("t", "sig"))
      .select(col("t"), col("sig"),
        col("vec_id").as("dst_id"), col("embedding").as("de"))
    // sort-merge by hint — same measured finding as [[knnJoin]]
    val edges = lhs.hint("merge").join(rhs, Seq("t", "sig"))
      .select(col("src_id"), col("dst_id"),
        round(graft.functions.VectorOps.cosine(col("se"), col("de")), 6)
          .as("cos_sim"))
    SimilarityOps.topKPerSrc(edges, "cos_sim", k)
  }

  /** A new index covering this index's vectors PLUS `newVectors` — the
    * ingestion path for a live corpus (daily document batches, the
    * streaming dedup filter): the batch's signatures are computed
    * under THIS index's hyperplane budget (one narrow pass — probes
    * keep hitting the same buckets) and unioned onto the signature
    * table, whose persisted blocks keep serving the bulk. Chained
    * appends stack narrow unions on the plan; long-running consumers
    * compact periodically through the [[writeTable]]/[[fromTable]]
    * round trip (or [[appendTable]] for the durable path). The
    * original index stays valid and this method never unpersists it. */
  override def append(newVectors: DataFrame, idCol: String,
      embCol: String): AnnIndex = {
    val add = AnnIndex.build(newVectors, idCol, embCol, tables,
      planesPerTable, persist = false)
    AnnIndex(sigs.unionByName(add.sigs), tables, planesPerTable)
  }

  /** Persist the index as a bucketed warehouse table: probes with
    * `sig` equality/IN predicates read only their own buckets. A tiny
    * `_meta` sidecar records the hyperplane BUDGET (tables ×
    * planesPerTable) so [[AnnIndex.fromTable]] reopens with the same
    * probe coverage — without it a 16-table index reopened at the
    * 8-table default would silently probe half its buckets. */
  def writeTable(table: String, buckets: Int = 32): Unit = {
    graft.sources.Warehouse.writeBucketed(sigs, table, "sig", buckets)
    val spark = sigs.sparkSession
    import spark.implicits._
    Seq((tables, planesPerTable)).toDF("tables", "planes_per_table")
      .write.mode("overwrite").format("parquet").saveAsTable(table + "_meta")
  }

  /** Append a new batch's signature rows to a bucketed index table
    * written by [[writeTable]] — the durable twin of [[append]].
    * `buckets` must match the original write (Spark refuses a
    * mismatched bucket spec), so existing probes keep pruning to their
    * buckets across the appended files. */
  def appendTable(table: String, newVectors: DataFrame, idCol: String,
      embCol: String, buckets: Int = 32): Unit = {
    // refuse a handle whose hyperplane budget differs from the table's
    // sidecar: rows signed under a different (tables x planes) budget
    // would silently land in buckets future probes never match
    val spark = sigs.sparkSession
    val (st, sp) =
      if (spark.catalog.tableExists(table + "_meta")) {
        val r = spark.table(table + "_meta").head()
        (r.getInt(0), r.getInt(1))
      } else (SimilarityOps.TABLES, SimilarityOps.PLANES_PER_TABLE)
    require(st == tables && sp == planesPerTable,
      s"this handle's hyperplane budget (${tables}x$planesPerTable) does " +
        s"not match ${table}'s (${st}x$sp) — appendTable must run through " +
        "a handle of the index that wrote the table (AnnIndex.fromTable " +
        "reopens one)")
    val add = AnnIndex.build(newVectors, idCol, embCol, tables,
      planesPerTable, persist = false)
    add.sigs.write.mode("append").format("parquet")
      .bucketBy(buckets, "sig").sortBy("sig").saveAsTable(table)
  }

  /** Release the index's executor storage (lineage stays valid — a
    * later probe recomputes instead of reading cached blocks). */
  def close(): Unit = sigs.unpersist(blocking = false)
}

object AnnIndex {

  /** Build (and by default cache in executor storage) the signature
    * index of a vector DataFrame: T rows per vector, one narrow pass.
    * `persist = false` for one-shot consumers ([[AnnIndex.knnJoin]]
    * pins its own working set and would otherwise leak the cache). */
  def build(vectors: DataFrame, idCol: String, embCol: String,
      tables: Int = SimilarityOps.TABLES,
      planesPerTable: Int = SimilarityOps.PLANES_PER_TABLE,
      persist: Boolean = true): AnnIndex = {
    graft.functions.VectorOps.register(vectors.sparkSession)
    // ONE native loop expression (PlaneSigs, bit-equal to the unrolled
    // lshTableSigs spelling — VectorExpressionsSpec) computes all
    // table signatures: the unrolled tables×planes dot expressions
    // cost ~0.5 s per corpus scan and bloated every downstream plan.
    val raw = vectors
      .select(col(idCol).as("vec_id"),
        col(embCol).cast("array<double>").as("embedding"))
      .select(col("vec_id"), col("embedding"),
        posexplode(graft.functions.VectorOps.planeSigs(
          col("embedding"), 0, tables, planesPerTable)).as(Seq("t", "sig")))
    val sigs = if (persist) raw.persist(StorageLevel.MEMORY_AND_DISK) else raw
    AnnIndex(sigs, tables, planesPerTable)
  }

  /** Reopen a bucketed index table written by [[AnnIndex.writeTable]]:
    * the hyperplane budget comes off the `_meta` sidecar (pre-sidecar
    * tables fall back to the engine defaults, which match how they
    * were written). Registers the vector functions so a FRESH session
    * can probe without the build() chokepoint having run. */
  def fromTable(spark: SparkSession, table: String): AnnIndex = {
    graft.functions.VectorOps.register(spark)
    val (t, p) =
      if (spark.catalog.tableExists(table + "_meta")) {
        val r = spark.table(table + "_meta").head()
        (r.getInt(0), r.getInt(1))
      } else (SimilarityOps.TABLES, SimilarityOps.PLANES_PER_TABLE)
    AnnIndex(spark.table(table), t, p)
  }

  // q_sim_ann builds the index once per (session, corpus) — "search"
  // means an index outlives the query stream that probes it. The cache
  // evicts on invalidate() and on session end (see IndexCache).
  private val cache = new IndexCache[AnnIndex](
    (spark, sfDir) => build(graft.sources.Tables.embeddings(spark, sfDir),
      "vec_id", "embedding"),
    _.close())

  /** The cached index of a test-data corpus dir. */
  def forDir(spark: SparkSession, sfDir: String): AnnIndex =
    cache.get(spark, sfDir)

  /** Drop and unpersist the cached index of one corpus dir. */
  def invalidate(spark: SparkSession, sfDir: String): Unit =
    cache.invalidate(spark, sfDir)

  /** Drop and unpersist every cached index of a session. */
  def invalidateAll(spark: SparkSession): Unit = cache.invalidateAll(spark)
}
