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
final case class AnnIndex(sigs: DataFrame) {

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
    val sigLits = SimilarityOps.tableSigsOf(probe)
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

  /** Persist the index as a bucketed warehouse table: probes with
    * `sig` equality/IN predicates read only their own buckets. */
  def writeTable(table: String, buckets: Int = 32): Unit =
    graft.sources.Warehouse.writeBucketed(sigs, table, "sig", buckets)

  /** Release the index's executor storage (lineage stays valid — a
    * later probe recomputes instead of reading cached blocks). */
  def close(): Unit = sigs.unpersist(blocking = false)
}

object AnnIndex {

  /** Build (and cache in executor storage) the signature index of a
    * vector DataFrame: T rows per vector, one narrow pass. */
  def build(vectors: DataFrame, idCol: String, embCol: String): AnnIndex = {
    val sigCols = SimilarityOps.lshTableSigs(col("embedding"))
    val sigs = vectors
      .select(col(idCol).as("vec_id"),
        col(embCol).cast("array<double>").as("embedding"))
      .select(col("vec_id"), col("embedding"),
        posexplode(array(sigCols: _*)).as(Seq("t", "sig")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    AnnIndex(sigs)
  }

  /** Reopen a bucketed index table written by [[AnnIndex.writeTable]]. */
  def fromTable(spark: SparkSession, table: String): AnnIndex =
    AnnIndex(spark.table(table))

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
