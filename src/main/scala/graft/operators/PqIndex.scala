package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Product-quantization (PQ) compact-code index — the third member of
  * the compact-representation family next to the hyperplane LSH
  * ([[AnnIndex]]) and the coarse quantizer + binary sketch
  * ([[IvfIndex]]): the FAISS-standard shape for billion-scale search
  * (PAPERS.md similarity-search family).
  *
  * Build: the embedding space splits into `subspaces` equal slices;
  * each subspace trains its own `centroidsPerSub` centroids with the
  * engine's deterministic recipe — hash-seeded starts (the
  * lowest-`xxhash64(vec_id)` vectors, the [[IvfIndex]] convention) and
  * DECIMAL-exact Lloyd means, so the codebook is bit-reproducible with
  * no RNG state. Every vector is then encoded as one small code per
  * subspace (4 bits at the default 16 centroids/subspace) by the
  * native generated-loop [[graft.functions.PqEncode]] — a 64-dim
  * 512-byte embedding becomes 8 codes.
  *
  * Search ([[topKVec]]/[[topK]]): asymmetric distance (ADC) — the
  * query is NEVER quantized; a per-probe lookup table holds the query
  * subvector's inner product with every centroid (subspaces ×
  * centroidsPerSub doubles, computed driver-side for a point probe),
  * and ranking each stored row is `subspaces` table reads
  * ([[graft.functions.PqAdc]], codegen'd) touching only the CODE
  * column — an order of magnitude fewer bytes than the embedding on a
  * column-pruned layout. The best `rescoreCap` candidates are exactly
  * rescored with the codegen'd cosine (TakeOrderedAndProject — no
  * shuffle, no join in stage 1). Approximate BY DESIGN: recall is
  * gated in SimilaritySpec against brute force, no SQL oracle.
  */
final case class PqIndex(codes: DataFrame,
    codebook: Seq[Seq[Seq[Double]]], size: Long) {

  import graft.functions.VectorOps

  /** Top-k neighbors of an external query vector: ADC scan of the code
    * column, exact rescore of the best `rescoreCap` rows. */
  def topKVec(probe: Seq[Double], k: Int = 10,
      rescoreCap: Int = 100): DataFrame =
    rankScan(codes, probe, k, rescoreCap)

  /** Top-k neighbors of an indexed vector (excludes the probe). */
  def topK(probeId: Long, k: Int = 10, rescoreCap: Int = 100): DataFrame = {
    val probe = codes.filter(col("vec_id") === probeId)
      .select("embedding").head().getSeq[Double](0)
    rankScan(codes.filter(col("vec_id") =!= probeId), probe, k, rescoreCap)
  }

  /** The probe's ADC lookup table (shared layout — [[PqIndex.lutOf]]). */
  private[graft] def lutOf(probe: Seq[Double]): Seq[Double] =
    PqIndex.lutOf(probe, codebook)

  private def rankScan(from: DataFrame, probe: Seq[Double], k: Int,
      rescoreCap: Int): DataFrame = {
    // stage 1 touches (vec_id, codes) only; ties break by vec_id so
    // the candidate set is deterministic
    val cand = from
      .select(col("vec_id"),
        VectorOps.pqAdc(col("codes"), lutOf(probe)).as("adc"))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(rescoreCap)
      .select("vec_id")
    from.join(cand, "vec_id") // rescoreCap rows — broadcast-sized
      .select(col("vec_id"),
        round(VectorOps.cosine(col("embedding"),
          typedLit(probe)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Grow the index with a new vector batch WITHOUT retraining — the
    * fixed-codebook ingest stance of [[IvfIndex.append]]: arrivals are
    * encoded under the EXISTING codebook (probes keep ranking every
    * stored code against the same lookup tables) and unioned onto the
    * code table; the stamped size grows. Codebook drift accumulates as
    * the corpus shifts — re-run [[PqIndex.build]] to retrain when
    * recall sags. */
  def append(newVectors: DataFrame, idCol: String, embCol: String): PqIndex = {
    graft.functions.VectorOps.register(codes.sparkSession)
    val e = newVectors.select(col(idCol).as("vec_id"),
      col(embCol).cast("array<double>").as("embedding"))
    val n = e.count()
    val add = e.withColumn("codes",
      graft.functions.VectorOps.pqEncode(col("embedding"), codebook))
    PqIndex(codes.unionByName(add), codebook, size + n)
  }

  /** Persist the code table bucketed by vec_id (point lookups and id
    * joins prune) plus a `_meta` sidecar holding the codebook and the
    * stamped size — the pair is self-describing,
    * [[PqIndex.fromTable]] reopens it with no out-of-band state. */
  def writeTable(table: String, buckets: Int = 32): Unit = {
    graft.sources.Warehouse.writeBucketed(codes, table, "vec_id", buckets)
    metaRows(size)
      .write.mode("overwrite").format("parquet").saveAsTable(table + "_meta")
  }

  /** Append a new batch to a bucketed index table written by
    * [[writeTable]] — encoding under THIS handle's codebook, same
    * bucket spec, sidecar size updated. Refuses a handle whose
    * codebook does not match the table's sidecar (rows encoded under a
    * different codebook would silently corrupt every future probe). */
  def appendTable(table: String, newVectors: DataFrame, idCol: String,
      embCol: String, buckets: Int = 32): Unit = {
    graft.functions.VectorOps.register(codes.sparkSession)
    val spark = codes.sparkSession
    val e = newVectors.select(col(idCol).as("vec_id"),
      col(embCol).cast("array<double>").as("embedding"))
    val n = e.count()
    val side = spark.table(table + "_meta").select("sub", "code", "centroid")
    val ours = metaRows(size).select("sub", "code", "centroid")
    require(side.exceptAll(ours).isEmpty && ours.exceptAll(side).isEmpty,
      s"this handle's codebook does not match ${table}_meta — appendTable " +
        "must run through a handle of the index that wrote the table " +
        "(PqIndex.fromTable reopens one)")
    val durable = spark.table(table + "_meta")
      .agg(max(col("n"))).head().getLong(0)
    e.withColumn("codes",
        graft.functions.VectorOps.pqEncode(col("embedding"), codebook))
      .write.mode("append").format("parquet")
      .bucketBy(buckets, "vec_id").sortBy("vec_id").saveAsTable(table)
    metaRows(durable + n)
      .write.mode("overwrite").format("parquet").saveAsTable(table + "_meta")
  }

  // Sidecar rows at a given stamped size (the codebook is a bounded
  // constant — subspaces × centroidsPerSub rows).
  private def metaRows(n: Long): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    codebook.zipWithIndex.flatMap { case (cents, s) =>
      cents.zipWithIndex.map { case (c, j) => (s, j, c, n) }
    }.toDF("sub", "code", "centroid", "n")
  }

  /** Release the code table's executor storage. */
  def close(): Unit = codes.unpersist(blocking = false)
}

object PqIndex {

  /** Deterministic PQ codebook training + corpus encoding. Defaults
    * (8 subspaces × 16 centroids over 64 dims) come from the measured
    * recall/cost point in BASELINE.md §PQ; raise `centroidsPerSub`
    * for finer cells (cost: a bigger per-probe lookup table, same
    * per-row scan work). Embeddings shorter than
    * subspaces·(dims/subspaces) are zero-padded by the encoder. */
  def build(vectors: DataFrame, idCol: String, embCol: String,
      subspaces: Int = 8, centroidsPerSub: Int = 16,
      iters: Int = 2): PqIndex = {
    graft.functions.VectorOps.register(vectors.sparkSession)
    val e = vectors.select(col(idCol).as("vec_id"),
      col(embCol).cast("array<double>").as("embedding"))
    val n = e.count()
    val cbSeq = trainCodebook(e, "embedding", subspaces, centroidsPerSub,
      iters)
    val codes = e
      .withColumn("codes",
        graft.functions.VectorOps.pqEncode(col("embedding"), cbSeq))
      .persist(StorageLevel.MEMORY_AND_DISK)
    PqIndex(codes, cbSeq, n)
  }

  /** Driver-side ADC lookup table of a probe vector against a
    * codebook, laid out `lut(sub·cps + c)` = inner product of the
    * query's subspace-s slice with centroid c — THE layout contract
    * [[graft.functions.PqAdc]] consumes ([[graft.functions.PqLut]] is
    * the per-row twin). One definition serves both [[PqIndex]] and
    * [[IvfPqIndex]] so the layout cannot drift between them. */
  private[operators] def lutOf(probe: Seq[Double],
      codebook: Seq[Seq[Seq[Double]]]): Seq[Double] = {
    val dsub = codebook.head.head.length
    codebook.zipWithIndex.flatMap { case (cents, s) =>
      val q = probe.slice(s * dsub, (s + 1) * dsub)
      cents.map(c =>
        q.iterator.zip(c.iterator).map { case (a, b) => a * b }.sum)
    }
  }

  /** Deterministic per-subspace Lloyd training over `df(vecCol)`
    * (shared by [[build]] and the IVF-PQ residual codebook,
    * [[IvfPqIndex.build]]): hash-seeded starts (`df` must carry a
    * `vec_id` column), DECIMAL-exact means, one corpus pass per
    * iteration. Returns `codebook(sub)(centroid)`. */
  private[operators] def trainCodebook(df: DataFrame, vecCol: String,
      subspaces: Int, centroidsPerSub: Int,
      iters: Int): Seq[Seq[Seq[Double]]] = {
    val dims = df.select(size(col(vecCol))).head().getInt(0)
    require(dims % subspaces == 0,
      s"embedding dims ($dims) must divide into $subspaces subspaces")
    val dsub = dims / subspaces
    // hash-seeded starts: subvectors of the lowest-hash vectors
    val seeds = df.orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(centroidsPerSub)
      .select(vecCol).collect().map(_.getSeq[Double](0).toSeq)
    require(seeds.length >= 1, "empty corpus")
    var cb: Array[Array[Array[Double]]] = Array.tabulate(subspaces)(s =>
      Array.tabulate(math.min(centroidsPerSub, seeds.length))(c =>
        seeds(c).slice(s * dsub, (s + 1) * dsub).toArray))
    for (_ <- 1 to iters) {
      val cbSeq: Seq[Seq[Seq[Double]]] =
        cb.map(_.map(_.toSeq).toSeq).toSeq
      // one corpus pass per iteration: encode under the current
      // codebook, then DECIMAL-exact means per (sub, code, dim) — the
      // same order-independent reduction as the IVF Lloyd step
      val means = df
        .select(col(vecCol).as("graft_v"), posexplode(
          graft.functions.VectorOps.pqEncode(col(vecCol), cbSeq))
          .as(Seq("sub", "code")))
        .select(col("sub"), col("code"), posexplode(
          slice(col("graft_v"), col("sub") * lit(dsub) + 1, lit(dsub)))
          .as(Seq("d", "v")))
        .groupBy("sub", "code", "d")
        .agg((sum(col("v").cast("decimal(38,18)")) /
          count(lit(1))).cast("double").as("m"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3))
        .toMap
      cb = Array.tabulate(subspaces)(s =>
        Array.tabulate(cb(s).length)(c =>
          // empty codes keep their previous centroid; dims past every
          // assigned vector's length keep theirs too (short vectors
          // slice to fewer dims than the encoder's zero-padded view,
          // so a (sub, code) cluster fed only short vectors has no
          // mean rows for its high dims)
          if (means.contains((s, c, 0)))
            Array.tabulate(dsub)(d => means.getOrElse((s, c, d), cb(s)(c)(d)))
          else cb(s)(c)))
    }
    cb.map(_.map(_.toSeq).toSeq).toSeq
  }

  /** Reopen a code table + `_meta` sidecar written by [[PqIndex
    * .writeTable]]: codebook and size come off the sidecar, so the
    * reopened index probes identically. */
  def fromTable(spark: SparkSession, table: String): PqIndex = {
    // fresh sessions must be able to probe the reopened index
    graft.functions.VectorOps.register(spark)
    val meta = spark.table(table + "_meta").collect()
    require(meta.nonEmpty, s"missing sidecar table ${table}_meta — was " +
      "the index written by PqIndex.writeTable?")
    val cb = meta.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map {
      case (_, rows) => rows.sortBy(_.getInt(1))
        .map(_.getSeq[Double](2).toSeq).toSeq
    }
    PqIndex(spark.table(table), cb, meta.head.getLong(3))
  }

  // Evicts on invalidate() and on session end (see IndexCache).
  private val cache = new IndexCache[PqIndex](
    (spark, sfDir) => build(graft.sources.Tables.embeddings(spark, sfDir),
      "vec_id", "embedding"),
    _.close())

  /** The cached PQ index of a test-data corpus dir. */
  def forDir(spark: SparkSession, sfDir: String): PqIndex =
    cache.get(spark, sfDir)

  /** Drop and unpersist the cached index of one corpus dir. */
  def invalidate(spark: SparkSession, sfDir: String): Unit =
    cache.invalidate(spark, sfDir)

  /** Drop and unpersist every cached index of a session. */
  def invalidateAll(spark: SparkSession): Unit = cache.invalidateAll(spark)
}
